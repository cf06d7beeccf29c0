"""Anchors for the Huber & Herzberg molecular tables (builtin path).

Round-2 verdict: the demo molecular tables were statistical-mechanics
approximations with no anchor to measured data.  The builtin generator now
computes vib-rot partition functions and equilibrium constants directly
from Huber & Herzberg (1979) spectroscopic constants; these tests pin the
results against independent textbook limits and known values.
"""

import numpy as np
import pytest

from stardis_tpu.atom_data.builtin import (
    DIATOMIC_CONSTANTS_HH,
    build_molecule_data_hh,
    diatomic_partition_function,
)
from stardis_tpu.constants import C_CGS, EV_TO_ERG, H_CGS, K_B_CGS


def kt_cm(t):
    return K_B_CGS * t / (H_CGS * C_CGS)


def test_co_partition_function_textbook_value():
    """U(CO, 1000 K) ~ 377: rigid-rotor kT/(hc Be) = 360 times the
    vibrational factor 1.048 (standard statistical-mechanics result for
    CO; e.g. McQuarrie, Statistical Mechanics)."""
    u = diatomic_partition_function(
        [1000.0], *DIATOMIC_CONSTANTS_HH["CO"][2:]
    )[0]
    assert 365.0 < u < 392.0, u


def test_rotational_sum_matches_classical_limit():
    """At kT >> Be the direct J sum must approach kT/(sigma hc Be) + 1/3
    (Euler-Maclaurin) — pins the ladder construction, not the constants."""
    for name in ("CO", "MgH"):
        _i1, _i2, we, wexe, be, sigma, g_el, d0 = DIATOMIC_CONSTANTS_HH[name]
        t = 3000.0
        u = diatomic_partition_function([t], we, wexe, be, sigma, g_el, d0)[0]
        u_vib = 1.0 / (1.0 - np.exp(-(we - 2 * wexe) / kt_cm(t)))
        u_classical = g_el * u_vib * (kt_cm(t) / (sigma * be) + 1.0 / 3.0)
        np.testing.assert_allclose(u, u_classical, rtol=0.05)


def test_h2_partition_function_range():
    """U(H2, 5000 K) ~ 40 (Irwin 1981 / B&C 2016 direct sums give ~39-42;
    ground electronic state only)."""
    u = diatomic_partition_function(
        [5000.0], *DIATOMIC_CONSTANTS_HH["H2"][2:]
    )[0]
    assert 34.0 < u < 47.0, u


def test_equilibrium_constant_slope_is_dissociation_energy():
    """After removing the T^{5/2} translational prefactor and the
    U_A U_B / U_AB ratio (from the STORED partition-function tables plus
    the builtin atomic U), d ln K / d(1/T) must equal -D0/k — the
    dissociation energies actually encoded in the stored equilibrium
    constants must be the Huber & Herzberg values, to 2%."""
    from stardis_tpu.atom_data.builtin import _atomic_u

    md = build_molecule_data_hh()
    cols = md.equilibrium_constants.columns.values.astype(float)
    sel = np.isin(cols, [3000.0, 4000.0, 5000.0])
    temps = cols[sel]
    for name, (i1, i2, *_c, d0) in DIATOMIC_CONSTANTS_HH.items():
        log_kp = md.equilibrium_constants.loc[name].values[sel]
        u_ab = md.partition_functions.loc[name].values[sel]
        u_ratio = _atomic_u(i1, temps) * _atomic_u(i2, temps) / u_ab
        ln_k = (
            log_kp * np.log(10.0)
            - 2.5 * np.log(temps)
            - np.log(u_ratio)
        )
        slope = np.polyfit(1.0 / temps, ln_k, 1)[0]  # = -D0/k exactly
        d0_fit_ev = -slope * K_B_CGS / EV_TO_ERG
        np.testing.assert_allclose(d0_fit_ev, d0, rtol=0.02,
                                   err_msg=name)


def test_mgh_forms_in_cool_atmospheres():
    """MgH is a classic cool-dwarf diagnostic: its equilibrium constant
    must make it orders of magnitude more abundant at 3000 K than 6000 K
    for fixed constituent densities (K_p grows steeply with T)."""
    md = build_molecule_data_hh()
    cols = md.equilibrium_constants.columns.values.astype(float)
    row = md.equilibrium_constants.loc["MgH"].values
    k3000 = np.interp(3000.0, cols, row)
    k6000 = np.interp(6000.0, cols, row)
    assert k6000 - k3000 > 1.0  # >10x more dissociated at 6000 K


def test_all_builtin_molecules_have_consistent_tables():
    md = build_molecule_data_hh()
    assert sorted(md.equilibrium_constants.index) == sorted(
        ["CH", "CO", "H2", "MgH", "OH", "C2", "O2", "N2", "CN", "SiO",
         "H2+"]
    )
    assert (md.partition_functions.values > 0).all()
    assert np.isfinite(md.equilibrium_constants.values).all()
    for name in md.dissociation_energies.index:
        row = md.dissociation_energies.loc[name]
        assert row.Ion1 in ("H", "C", "O", "N", "Mg", "Si")
        assert 1.0 < row.dissociation_energy < 12.0


def test_c2_low_lying_triplet_dominates_partition_function():
    """C2's a3Pi_u state at 716 cm^-1 (g=6) carries several times the
    X 1Sg+ weight at photospheric temperatures; the multistate U must be
    well above the ground-state-only sum (B&C2016 include it too)."""
    from stardis_tpu.atom_data.builtin import (
        diatomic_partition_function_multistate,
    )

    t = np.array([4000.0, 6000.0])
    u_ground = diatomic_partition_function(
        t, *DIATOMIC_CONSTANTS_HH["C2"][2:]
    )
    u_full = diatomic_partition_function_multistate(t, "C2")
    assert (u_full > 3.0 * u_ground).all()
    assert (u_full < 12.0 * u_ground).all()
