"""Line-opacity pipeline: host-side line selection + device-side per-line
quantities (alpha, gamma, Doppler widths).

Covers the functionality of reference AlphaLine / AlphaLineVald
(plasma/base.py:130-455) and the line-table preparation in
calc_alpha_line_at_nu (opacities_solvers/base.py:328-441), restructured
TPU-first: pandas merges happen once on host at ingest; the device computes
dense [lines x depth] arrays from the plasma state.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pandas as pd

from stardis_tpu.constants import (
    ALPHA_COEFFICIENT,
    C_CGS,
    EV_TO_ERG,
    H_CGS,
    K_B_CGS,
)
from stardis_tpu.opacities.broadening import calc_doppler_width, calc_gamma
from stardis_tpu.plasma.tables import PlasmaTables


@dataclasses.dataclass
class LineData:
    """Host-prepared per-line arrays, sorted by frequency ascending and
    restricted to the tracing range (reference base.py:392-396)."""

    nu: np.ndarray  # [L] Hz
    atomic_number: np.ndarray  # [L]
    ion_number: np.ndarray  # [L] charge
    ionization_energy: np.ndarray  # [L] erg (of ion_number+1 stage)
    level_energy_lower: np.ndarray  # [L] erg
    level_energy_upper: np.ndarray  # [L] erg
    A_ul: np.ndarray  # [L] 1/s
    mass: np.ndarray  # [L] g
    # TARDIS-path fields
    lower_level_flat: np.ndarray | None = None  # [L] index into level table
    f_lu: np.ndarray | None = None  # [L]
    # VALD-path fields
    vald_slot: np.ndarray | None = None  # [L] ion slot for N_ion/U
    vald_gf: np.ndarray | None = None  # [L] 10^log_gf
    vald_e_low_erg: np.ndarray | None = None  # [L]
    vald_stark: np.ndarray | None = None  # [L]
    vald_waals: np.ndarray | None = None  # [L]

    @property
    def n_lines(self):
        return len(self.nu)


def prepare_line_data(
    atom_data, tables: PlasmaTables, nu_min, nu_max, use_vald=False,
    drop_autoionization=True,
) -> LineData:
    """Select and annotate lines in [nu_min, nu_max].

    TARDIS path: lines from atom_data.lines joined with level energies and
    ionization energies (reference base.py:366-390).
    VALD path: lines from atom_data.linelist_atoms (reference
    plasma/base.py:200-321); autoionizing lines (E_up above the ionization
    energy) are dropped when requested (plasma/base.py:318-321).
    """
    if use_vald:
        if atom_data.linelist_atoms is None:
            raise ValueError("atom data has no VALD linelist_atoms")
        ll = atom_data.linelist_atoms.rename(columns={"ion_charge": "ion_number"})
        ll = ll[ll.atomic_number <= atom_data.selected_atomic_numbers.max()].copy()
        nu = (C_CGS / (ll.wavelength.values * 1e-8)).astype(float)
        ll["nu"] = nu
        if "e_up" not in ll.columns:  # shortlist: reconstruct E_up from lambda
            ll["e_up"] = ll.e_low.values + (
                H_CGS * C_CGS / (ll.wavelength.values * 1e-8)
            ) / EV_TO_ERG
        frame = ll
    else:
        frame = atom_data.lines.copy()
        frame = frame[
            frame.atomic_number.isin(atom_data.selected_atomic_numbers)
        ].copy()

    frame = frame.sort_values("nu")
    frame = frame[(frame.nu >= nu_min) & (frame.nu <= nu_max)]

    # merge chi of the next ionization stage: ionization_data is keyed by the
    # produced stage, so charge `q` lines need key (Z, q+1)
    # (reference base.py:368-373 / plasma/base.py:301-308)
    ion_e = atom_data.ionization_data.reset_index()
    ion_e["ion_number"] -= 1
    frame = pd.merge(
        frame, ion_e, how="left", on=["atomic_number", "ion_number"]
    )

    masses = atom_data.atom_data.mass

    if use_vald:
        e_low = frame.e_low.values * EV_TO_ERG
        e_up = frame.e_up.values * EV_TO_ERG
        long_form = "j_lo" in frame.columns
        if long_form:
            # long-form VALD lists ALWAYS drop autoionizing lines
            # (reference AlphaLineVald, plasma/base.py:318-321; strict <)
            keep = e_up < frame.ionization_energy.values
        elif drop_autoionization:
            # shortlists drop only via the calc_alpha path's conditional
            # (reference base.py:413-421); note the reference keeps
            # equality/NaN cases: drop condition is e_up > chi
            keep = ~(e_up > frame.ionization_energy.values)
        else:
            keep = np.ones(len(frame), dtype=bool)
        frame = frame[keep]
        e_low, e_up = e_low[keep], e_up[keep]
        vald_slot = np.array(
            [
                tables.slot_of(int(z), int(q))
                for z, q in zip(frame.atomic_number.values, frame.ion_number.values)
            ],
            dtype=np.int64,
        )
        # gf = g_lo * f_lu as VALD tabulates it; the g_lo in n_lower and the
        # /g_lo in f_lu cancel, so both long and short forms use 10^log_gf
        vald_gf = 10.0 ** frame.log_gf.values
        return LineData(
            nu=frame.nu.values.astype(float),
            atomic_number=frame.atomic_number.values.astype(np.int64),
            ion_number=frame.ion_number.values.astype(np.int64),
            ionization_energy=frame.ionization_energy.values.astype(float),
            level_energy_lower=e_low,
            level_energy_upper=e_up,
            A_ul=10.0 ** frame.rad.values,
            mass=masses.loc[frame.atomic_number.values].values.astype(float),
            vald_slot=vald_slot,
            vald_gf=vald_gf.astype(float),
            vald_e_low_erg=e_low,
            vald_stark=frame.stark.values.astype(float),
            vald_waals=frame.waals.values.astype(float),
        )

    # TARDIS path: join level energies via the flat level index
    lower_flat = np.array(
        [
            tables.level_flat_index[
                (int(z), int(q), int(ll_num))
            ]
            for z, q, ll_num in zip(
                frame.atomic_number.values,
                frame.ion_number.values,
                frame.level_number_lower.values,
            )
        ],
        dtype=np.int64,
    )
    e_low = tables.level_energy[lower_flat]
    upper_flat = np.array(
        [
            tables.level_flat_index[
                (int(z), int(q), int(ul_num))
            ]
            for z, q, ul_num in zip(
                frame.atomic_number.values,
                frame.ion_number.values,
                frame.level_number_upper.values,
            )
        ],
        dtype=np.int64,
    )
    e_up = tables.level_energy[upper_flat]

    if drop_autoionization:
        # reference base.py:413-421: lines whose upper level lies above the
        # ionization energy are dropped when VALD broadening is not in use;
        # the reference's drop condition is e_up > chi, so equality and
        # NaN-chi rows are KEPT
        keep = ~(e_up > frame.ionization_energy.values)
        frame = frame[keep]
        lower_flat = lower_flat[keep]
        e_low, e_up = e_low[keep], e_up[keep]

    return LineData(
        nu=frame.nu.values.astype(float),
        atomic_number=frame.atomic_number.values.astype(np.int64),
        ion_number=frame.ion_number.values.astype(np.int64),
        ionization_energy=frame.ionization_energy.values.astype(float),
        level_energy_lower=e_low,
        level_energy_upper=e_up,
        A_ul=frame.A_ul.values.astype(float),
        mass=masses.loc[frame.atomic_number.values].values.astype(float),
        lower_level_flat=lower_flat,
        f_lu=frame.f_lu.values.astype(float),
    )


def compute_vald_gamma(
    line_data: LineData,
    state,
    temperatures,
    broadening_flags,
    dtype=None,
):
    """VALD-parameter broadening (reference broadening.py:1009-1085):
    radiation from A_ul, stark/vdW from the per-line VALD columns (linear
    Stark still computed for hydrogen lines), summed then halved
    (HWHM -> FWHM, reference broadening.py:1084)."""
    from stardis_tpu.opacities.broadening import (
        calc_gamma_linear_stark,
        calc_n_effective,
        calc_vald_stark_gamma,
        calc_vald_vdW,
    )

    ld = line_data
    t = temperatures
    n_e = state.electron_densities
    h1_density = state.h_neutral_density
    n_lines = ld.n_lines
    n_depth = t.shape[0]

    gamma = jnp.zeros((n_lines, n_depth), dtype=dtype or t.dtype)
    if "radiation" in broadening_flags:
        gamma = gamma + jnp.asarray(ld.A_ul, dtype=dtype)[:, None]
    if "linear_stark" in broadening_flags:
        ion_p1 = jnp.asarray(ld.ion_number, dtype=gamma.dtype)[:, None] + 1.0
        chi = jnp.asarray(ld.ionization_energy, dtype=dtype)[:, None]
        n_eff_up = calc_n_effective(
            ion_p1, chi, jnp.asarray(ld.level_energy_upper, dtype=dtype)[:, None]
        )
        n_eff_lo = calc_n_effective(
            ion_p1, chi, jnp.asarray(ld.level_energy_lower, dtype=dtype)[:, None]
        )
        g_lin = calc_gamma_linear_stark(n_eff_up, n_eff_lo, n_e[None, :])
        h_mask = jnp.asarray(ld.atomic_number == 1)[:, None]
        gamma = gamma + jnp.where(h_mask, g_lin, 0.0)
    if (
        "quadratic_stark" in broadening_flags
        and ld.vald_stark is not None
    ):
        gamma = gamma + calc_vald_stark_gamma(
            n_e[None, :],
            jnp.asarray(ld.vald_stark, dtype=dtype)[:, None],
            t[None, :],
        )
    if "van_der_waals" in broadening_flags and ld.vald_waals is not None:
        gamma = gamma + calc_vald_vdW(
            jnp.asarray(ld.vald_waals, dtype=dtype)[:, None],
            t,
            jnp.asarray(ld.mass, dtype=dtype)[:, None],
            jnp.asarray(ld.level_energy_upper, dtype=dtype)[:, None],
            jnp.asarray(ld.level_energy_lower, dtype=dtype)[:, None],
            h1_density,
            jnp.asarray(ld.ion_number, dtype=gamma.dtype)[:, None] + 1.0,
            jnp.asarray(ld.ionization_energy, dtype=dtype)[:, None],
        )
    return gamma / 2.0  # HWHM to FWHM (reference broadening.py:1084)


def compute_line_quantities(
    line_data: LineData,
    state,
    temperatures,
    microturbulence_cgs,
    broadening_flags,
    dtype=None,
    use_vald_broadening=False,
):
    """Device-side per-line per-depth quantities.

    Returns (alpha [L, D], gamma [L, D], doppler_width [L, D]).

    alpha follows reference AlphaLine (plasma/base.py:146-175) for the
    TARDIS path and AlphaLineVald (plasma/base.py:200-321) for VALD; the
    stimulated-emission factor is the LTE closed form 1 - e^{-h nu / k T}
    (identical to TARDIS's g-ratio expression in LTE).
    """
    ld = line_data
    t = temperatures
    nu = jnp.asarray(ld.nu, dtype=dtype)[:, None]  # [L, 1]
    stim = 1.0 - jnp.exp(-H_CGS * nu / (K_B_CGS * t[None, :]))

    if ld.lower_level_flat is not None:
        n_lower = state.level_number_density[jnp.asarray(ld.lower_level_flat)]
        alpha = (
            ALPHA_COEFFICIENT
            * jnp.asarray(ld.f_lu, dtype=dtype)[:, None]
            * n_lower
            * stim
        )
    else:
        # VALD: n_lower/g_lo = (N_ion / U) e^{-beta E_low};
        # alpha = C * gf * (N_ion/U) e^{-beta E_low} * stim
        slot = jnp.asarray(ld.vald_slot)
        n_over_u = (
            state.ion_number_density[slot] / state.partition_function[slot]
        )  # [L, D]
        boltz = jnp.exp(
            -jnp.asarray(ld.vald_e_low_erg, dtype=dtype)[:, None]
            * state.beta[None, :]
        )
        alpha = (
            ALPHA_COEFFICIENT
            * jnp.asarray(ld.vald_gf, dtype=dtype)[:, None]
            * n_over_u
            * boltz
            * stim
        )

    h1_density = state.h_neutral_density
    if use_vald_broadening:
        gamma = compute_vald_gamma(
            ld, state, t, broadening_flags, dtype=dtype
        )
        doppler = calc_doppler_width(
            nu, t[None, :], jnp.asarray(ld.mass, dtype=dtype)[:, None],
            microturbulence_cgs,
        )
        return alpha, gamma, doppler
    gamma = calc_gamma(
        atomic_number=jnp.asarray(ld.atomic_number)[:, None],
        ion_number=jnp.asarray(ld.ion_number, dtype=alpha.dtype)[:, None] + 1.0,
        ionization_energy=jnp.asarray(ld.ionization_energy, dtype=dtype)[:, None],
        upper_level_energy=jnp.asarray(ld.level_energy_upper, dtype=dtype)[:, None],
        lower_level_energy=jnp.asarray(ld.level_energy_lower, dtype=dtype)[:, None],
        A_ul=jnp.asarray(ld.A_ul, dtype=dtype)[:, None],
        electron_density=state.electron_densities,
        temperature=t,
        h_density=h1_density,
        linear_stark="linear_stark" in broadening_flags,
        quadratic_stark="quadratic_stark" in broadening_flags,
        van_der_waals="van_der_waals" in broadening_flags,
        radiation="radiation" in broadening_flags,
    )

    doppler = calc_doppler_width(
        nu, t[None, :], jnp.asarray(ld.mass, dtype=dtype)[:, None],
        microturbulence_cgs,
    )
    return alpha, gamma, doppler
