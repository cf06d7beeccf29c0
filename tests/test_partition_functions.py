"""Partition-function fidelity of the builtin NIST level tables.

Round-1 verdict: ground-term-only metal partition functions made U(T) for
the dominant electron donors wrong at the 10-50% level (U(Fe I, 5777 K)=25
'only by luck').  These tests pin U(5777 K) for every species with a
transcribed NIST table against published ranges (Gray 2005 App. D, Irwin
1981, Allen), and check the device path agrees with the host sum.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.atom_data.builtin import build_builtin_atom_data
from stardis_tpu.atom_data.nist_levels import (
    NIST_METAL_LEVELS_EV,
    PUBLISHED_U_10000K_RANGES,
    PUBLISHED_U_5777K_RANGES,
)
from stardis_tpu.constants import K_B_CGS
from stardis_tpu.plasma.lte import device_tables, solve_lte
from stardis_tpu.plasma.tables import build_plasma_tables

T_SUN = 5777.0


@pytest.fixture(scope="module")
def tables():
    adata = build_builtin_atom_data(30)
    return build_plasma_tables(adata)


def host_partition_function(tables, z, ion, temp):
    slot = tables.slot_of(z, ion)
    sel = tables.level_slot == slot
    return float(
        (
            tables.level_g[sel]
            * np.exp(-tables.level_energy[sel] / (K_B_CGS * temp))
        ).sum()
    )


@pytest.mark.parametrize("species", sorted(PUBLISHED_U_5777K_RANGES))
def test_u_5777_in_published_range(tables, species):
    z, ion = species
    lo, hi = PUBLISHED_U_5777K_RANGES[species]
    u = host_partition_function(tables, z, ion, T_SUN)
    assert lo <= u <= hi, (
        f"U(Z={z}, ion={ion}, 5777K) = {u:.2f} outside published "
        f"range [{lo}, {hi}]"
    )


def test_levels_sorted_and_ground_at_zero():
    for (z, ion), levels in NIST_METAL_LEVELS_EV.items():
        energies = [e for e, g in levels]
        assert energies[0] == 0.0, (z, ion)
        assert energies == sorted(energies), (z, ion)
        assert all(g >= 1 for _, g in levels), (z, ion)


def test_device_partition_function_matches_host(tables):
    """solve_lte's partition functions must equal the host Boltzmann sum."""
    dt = device_tables(tables)
    temps = jnp.asarray([4000.0, T_SUN, 9000.0])
    # a thin hydrogen-dominated gas; exact densities don't matter for U
    n_elem = jnp.full((tables.n_elements, 3), 1e4)
    e_h = int(np.searchsorted(tables.zs, 1))
    n_elem = n_elem.at[e_h].set(1e12)
    state = jax.jit(lambda t, n: solve_lte(t, n, dt))(temps, n_elem)
    u_dev = np.asarray(state.partition_function)  # [S, D]
    for (z, ion) in PUBLISHED_U_5777K_RANGES:
        slot = tables.slot_of(z, ion)
        for d, temp in enumerate([4000.0, T_SUN, 9000.0]):
            u_host = host_partition_function(tables, z, ion, float(temp))
            np.testing.assert_allclose(
                u_dev[slot, d], u_host, rtol=1e-6,
                err_msg=f"(Z={z}, ion={ion}, T={temp})",
            )


def test_fe_i_u_beats_ground_term_only(tables):
    """The round-1 failure mode: U(Fe I) pinned at g0=25 for all T."""
    u_cool = host_partition_function(tables, 26, 0, 4000.0)
    u_sun = host_partition_function(tables, 26, 0, T_SUN)
    u_hot = host_partition_function(tables, 26, 0, 8000.0)
    assert u_cool < u_sun < u_hot  # T-dependence exists
    assert u_sun > 26.0  # excited terms contribute beyond g0=25


@pytest.mark.parametrize("species", sorted(PUBLISHED_U_10000K_RANGES))
def test_u_10000_in_published_range(tables, species):
    """Hot-star anchor (round-2 verdict: builtin U(T) was only pinned at
    5777 K).  Only species whose low-lying tables stay nearly complete at
    10^4 K are pinned — see PUBLISHED_U_10000K_RANGES."""
    z, ion = species
    lo, hi = PUBLISHED_U_10000K_RANGES[species]
    u = host_partition_function(tables, z, ion, 10_000.0)
    assert lo <= u <= hi, (
        f"U(Z={z}, ion={ion}, 10000K) = {u:.2f} outside published "
        f"range [{lo}, {hi}]"
    )


def test_he_i_n4_to_n6_levels_present(tables):
    """He I now carries the n=4 shell + n=5/6 hydrogenic clusters: the
    total He I statistical weight above 23.5 eV must be >= 3+1+9+15+5+28+3
    + 100 + 144."""
    slot = tables.slot_of(2, 0)
    sel = tables.level_slot == slot
    high = tables.level_energy[sel] > 23.5 * 1.602176634e-12
    assert tables.level_g[sel][high].sum() >= 308


def test_u_10000_fe_group_pins_within_10pct(tables):
    """Round-4 verdict #9: the species with solid published full-ladder
    U(10^4 K) central values (Irwin 1981-era consensus, provenance
    documented next to HIGH_LADDER_TAILS_EV) are pinned at +-10%, not
    just bracketed — a tail-weight regression that moves Fe I/II,
    Ti I/II or Cr I/II by more than 10% fails here."""
    from stardis_tpu.atom_data.nist_levels import PUBLISHED_U_10000K_PINS

    assert len(PUBLISHED_U_10000K_PINS) == 6
    for (z, ion), central in PUBLISHED_U_10000K_PINS.items():
        u = host_partition_function(tables, z, ion, 10_000.0)
        assert abs(u - central) <= 0.10 * central, (
            f"U(Z={z}, ion={ion}, 10^4 K) = {u:.1f} deviates more than "
            f"10% from the published central value {central}"
        )
