"""Cross-section file readers (host-side).

Implements the three tabulated-opacity formats the reference supports
(reference opacities_solvers/util.py:14-108):

* ``H2plus_bf``  — Stancil 1994: wavelength[nm] x T table, values like
                   ``7.34-5`` (implicit exponent), scale 1e-18 cm^2.
* ``Hminus_ff``  — Bell & Berrington 1987: wavelength[AA] x theta=5040/T
                   table, scale 1e-26 * k_B * T (converts the tabulated
                   pressure coefficient to a cross-section per n(HI) n_e).
* ``Hminus_bf``  — Wishart 1979: two-column wavelength[AA], sigma[cm^2] CSV.

Additionally provides the John (1988, A&A 193, 189) analytic fits for H-
bound-free and free-free as a data-file-free alternative
(``Hminus_bf_john`` / ``Hminus_ff_john`` opacity sources) — an extension
over the reference, which always requires data files.

Interpolation onto the (depth-temperature x wavelength) grid happens here on
host (static per run since the model temperatures are fixed); the device
kernel just multiplies by the species number density.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd

from stardis_tpu.constants import C_CGS, K_B_CGS

logger = logging.getLogger(__name__)


def _interp2d_linear(x_tab, y_tab, values, x_query, y_query):
    """Bilinear interpolation on a rectilinear grid with 0 fill outside.

    Replaces the reference's scattered-data LinearNDInterpolator — the
    tables are rectilinear, so bilinear on the grid is both faster and free
    of triangulation artifacts.
    """
    from scipy.interpolate import RegularGridInterpolator

    interp = RegularGridInterpolator(
        (np.asarray(x_tab, dtype=float), np.asarray(y_tab, dtype=float)),
        values,
        bounds_error=False,
        fill_value=0.0,
    )
    pts = np.stack(
        [np.broadcast_to(x_query, np.broadcast_shapes(x_query.shape, y_query.shape)),
         np.broadcast_to(y_query, np.broadcast_shapes(x_query.shape, y_query.shape))],
        axis=-1,
    )
    return interp(pts)


def sigma_file(tracing_lambdas, temperatures, fpath, opacity_source):
    """sigma [n_depth, n_lambda] for a tabulated opacity source."""
    fpath = Path(fpath)
    lambdas = np.asarray(tracing_lambdas, dtype=float)
    temps = np.asarray(temperatures, dtype=float)

    if opacity_source == "H2plus_bf":
        table = pd.read_csv(fpath, sep=r"\s+", index_col=0, comment="#")
        table = table.replace({"-": "e-"}, regex=True).astype(float)
        wave_aa = table.index.values.astype(float) * 10.0  # nm -> AA
        file_temps = table.columns.values.astype(float)
        sig = _interp2d_linear(
            wave_aa,
            file_temps,
            table.to_numpy(),
            lambdas[None, :],
            temps[:, None],
        ) * 1e-18
        if np.any(sig == 0):
            logger.warning(
                "H2+ bf: outside interpolation range at some depth points; "
                "assuming 0 opacity there."
            )
        return sig

    if opacity_source == "Hminus_ff":
        table = pd.read_csv(fpath, sep=r"\s+", comment="#")
        table.columns = table.columns.str.strip(",")
        wave = table[table.columns[0]].values.astype(float)
        thetas = table.columns[1:].astype(float).values
        values = table.to_numpy()[:, 1:].astype(float)
        sig = _interp2d_linear(
            wave,
            thetas,
            values,
            lambdas[None, :],
            (5040.0 / temps)[:, None],
        )
        sig = sig * 1e-26 * K_B_CGS * temps[:, None]
        if np.any(sig == 0):
            logger.warning(
                "H- ff: outside interpolation range at some depth points; "
                "assuming 0 opacity there."
            )
        return sig

    if opacity_source == "Hminus_bf":
        table = pd.read_csv(
            fpath, header=None, comment="#", names=["wavelength", "cross_section"]
        )
        sig_1d = np.interp(
            lambdas, table.wavelength.values, table.cross_section.values
        )
        return np.broadcast_to(sig_1d, (len(temps), len(lambdas))).copy()

    raise ValueError(f"Unknown opacity_source: {opacity_source}")


# ----------------------------------------------------------------------
# John 1988 analytic H- fits (extension; no data file needed)
# ----------------------------------------------------------------------

_JOHN88_BF_C = np.array(
    [152.519, 49.534, -118.858, 92.536, -34.194, 4.982]
)


def john88_hminus_bf_sigma(lambda_aa):
    """H- bound-free cross-section [cm^2 per H- ion], John 1988 eq. 4-5.

    Valid 1250 AA < lambda < 16419 AA (the photodetachment threshold).
    """
    lam_um = np.asarray(lambda_aa, dtype=float) / 1e4
    lam0 = 1.6419  # um, threshold
    x = np.clip(1.0 / lam_um - 1.0 / lam0, 0.0, None)
    f = np.zeros_like(lam_um)
    sqrt_x = np.sqrt(x)
    for n, c in enumerate(_JOHN88_BF_C, start=1):
        f = f + c * sqrt_x ** (n - 1)
    sigma = 1e-18 * lam_um**3 * x**1.5 * f
    return np.where((lam_um > 0.125) & (lam_um < lam0), sigma, 0.0)


_JOHN88_FF_TABLE_HIGH = np.array(
    # lambda > 0.3645 um coefficients A_n..F_n for n=1..6 (John 1988 table 3a)
    [
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [2483.346, 285.827, -2054.291, 2827.776, -1341.537, 208.952],
        [-3449.889, -1158.382, 8746.523, -11485.632, 5303.609, -812.939],
        [2200.040, 2427.719, -13651.105, 16755.524, -7510.494, 1132.738],
        [-696.271, -1841.400, 8624.970, -10051.530, 4400.067, -655.020],
        [88.283, 444.517, -1863.864, 2095.288, -901.788, 132.985],
    ]
)


def john88_hminus_ff_sigma(lambda_aa, temperature):
    """H- free-free 'cross-section' [cm^4/dyn] * k_B T n_e convention:

    Returns kappa / (n(HI) * n_e * k_B T) consistent with the Bell &
    Berrington table convention used by the reference (multiply by
    n(HI) * n_e * k_B * T to get alpha in 1/cm).  John 1988 eq. 6.
    Valid lambda > 3645 AA, 1400 K < T < 10080 K.
    """
    lam_um = np.atleast_1d(np.asarray(lambda_aa, dtype=float)) / 1e4
    t = np.atleast_1d(np.asarray(temperature, dtype=float))[:, None]
    theta = 5040.0 / t
    kappa = np.zeros((t.shape[0], lam_um.shape[0]))
    for n in range(1, 7):
        a, b, c, d, e, f = _JOHN88_FF_TABLE_HIGH[n - 1]
        kappa = kappa + theta ** ((n + 1) / 2.0) * (
            lam_um**2 * a
            + b
            + c / lam_um
            + d / lam_um**2
            + e / lam_um**3
            + f / lam_um**4
        )
    # John's formula gives kappa in cm^4/dyn once scaled by 1e-29
    return np.clip(kappa * 1e-29, 0.0, None)
