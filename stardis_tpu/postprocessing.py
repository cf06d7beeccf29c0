"""Post-processing: rotational and instrumental broadening.

Mirrors reference broadening.py:824-877 (rotation_broadening, Gray's
rotational kernel with linear limb darkening) and the docs' instrumental
broadening recipe (gaussian_filter1d in
docs/rotation_broadening/rotation_broadening.ipynb).
"""

from __future__ import annotations

import numpy as np

from stardis_tpu import units as u
from stardis_tpu.constants import C_KMS


def rotation_broadening(
    velocity_per_pix, wavelength, flux, v_rot=None, limb_darkening=0.6
):
    """Convolve a spectrum with Gray's rotational profile.

    Only accurate when velocity_per_pix is constant over the spectrum
    (reference broadening.py:824-877).

    Parameters
    ----------
    velocity_per_pix : Quantity [km/s] — velocity width of one pixel.
    wavelength : Quantity [AA]
    flux : array or Quantity — F_lambda
    v_rot : Quantity [km/s] — v sin i
    limb_darkening : float, default 0.6

    Returns
    -------
    (wavelength, broadened_flux Quantity [erg/s/cm^2/AA])
    """
    vel_pix = (
        velocity_per_pix.to(u.km / u.s).value
        if hasattr(velocity_per_pix, "to")
        else float(velocity_per_pix)
    )
    if v_rot is None:
        v_rot_kms = 0.0
    else:
        v_rot_kms = (
            v_rot.to(u.km / u.s).value if hasattr(v_rot, "to") else float(v_rot)
        )
    flux_vals = np.asarray(flux, dtype=float)

    if np.abs(v_rot_kms) < 1e-5:
        return wavelength, u.Quantity(flux_vals, u.erg / u.s / u.cm**2 / u.AA)

    v_rot_by_c = max(1e-5, abs(v_rot_kms)) / C_KMS
    half_width_pix = int(round(v_rot_kms / vel_pix))
    profile_velocity = (
        np.linspace(-half_width_pix, half_width_pix, 2 * half_width_pix + 1)
        * vel_pix
    )
    profile = np.maximum(0.0, 1.0 - (profile_velocity / v_rot_kms) ** 2)
    rotational_profile = (
        2.0 * (1.0 - limb_darkening) * np.sqrt(profile)
        + 0.5 * np.pi * limb_darkening * profile
    ) / (np.pi * v_rot_by_c * (1.0 - limb_darkening / 3.0))

    kernel = rotational_profile / rotational_profile.sum()
    from scipy.ndimage import convolve1d

    broadened = convolve1d(flux_vals, kernel)
    return wavelength, u.Quantity(broadened, u.erg / u.s / u.cm**2 / u.AA)


def instrumental_broadening(wavelength, flux, resolution=None, sigma_aa=None):
    """Gaussian instrumental broadening.

    Specify either a resolving power R = lambda/dlambda (FWHM) or a Gaussian
    sigma in Angstroms.  Requires a uniform wavelength grid.
    """
    lam = np.asarray(wavelength, dtype=float)
    flux_vals = np.asarray(flux, dtype=float)
    dlam = np.diff(lam)
    if not np.allclose(dlam, dlam[0], rtol=1e-6):
        raise ValueError("instrumental_broadening requires a uniform grid")
    if sigma_aa is None:
        if resolution is None:
            raise ValueError("give either resolution or sigma_aa")
        fwhm = np.mean(lam) / resolution
        sigma_aa = fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    sigma_pix = sigma_aa / abs(dlam[0])
    from scipy.ndimage import gaussian_filter1d

    return wavelength, u.Quantity(
        gaussian_filter1d(flux_vals, sigma_pix), u.erg / u.s / u.cm**2 / u.AA
    )
