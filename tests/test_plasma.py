import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.atom_data import build_builtin_atom_data
from stardis_tpu.constants import EV_TO_ERG, H_CGS, K_B_CGS, M_E_CGS
from stardis_tpu.plasma.lte import device_tables, solve_lte
from stardis_tpu.plasma.tables import build_plasma_tables


@pytest.fixture(scope="module")
def h_only_setup():
    ad = build_builtin_atom_data(max_atomic_number=1)
    tables = build_plasma_tables(ad)
    return tables, device_tables(tables)


def analytic_h_ionization(t, n_h):
    """Exact Saha solution for a pure-H plasma (quadratic in n_e)."""
    chi = 13.598434005136 * EV_TO_ERG
    beta = 1.0 / (K_B_CGS * t)
    g_e = (2 * np.pi * M_E_CGS * K_B_CGS * t / H_CGS**2) ** 1.5
    # partition function of H I with n<=20 levels
    n = np.arange(1, 21)
    u1 = np.sum(
        2 * n[:, None] ** 2 * np.exp(-chi * (1 - 1 / n[:, None] ** 2) * beta), axis=0
    )
    phi = 2.0 * (1.0 / u1) * g_e * np.exp(-beta * chi)
    # x^2/(1-x) = phi/n_h  ->  x = (-phi + sqrt(phi^2+4 phi n_h)) / (2 n_h)
    x = (-phi + np.sqrt(phi**2 + 4 * phi * n_h)) / (2 * n_h)
    return x * n_h  # n_e = n_HII


def test_pure_hydrogen_saha_matches_analytic(h_only_setup):
    tables, dt = h_only_setup
    t = np.array([4000.0, 5000.0, 6000.0, 8000.0, 10000.0, 15000.0])
    n_h = np.full_like(t, 1e17)
    state = solve_lte(jnp.asarray(t), jnp.asarray(n_h)[None, :], dt)
    expected = analytic_h_ionization(t, n_h)
    np.testing.assert_allclose(
        np.asarray(state.electron_densities), expected, rtol=1e-8
    )
    # charge conservation: n_e == n_HII for pure H
    np.testing.assert_allclose(
        np.asarray(state.electron_densities),
        np.asarray(state.ion_number_density[1]),
        rtol=1e-8,
    )


def test_level_populations_boltzmann(h_only_setup):
    tables, dt = h_only_setup
    t = np.array([6000.0])
    state = solve_lte(jnp.asarray(t), jnp.asarray([[1e17]]), dt)
    n_lev = np.asarray(state.level_number_density)
    # n=2 / n=1 ratio = (g2/g1) exp(-dE/kT)
    chi = 13.598434005136 * EV_TO_ERG
    de = chi * (1 - 0.25)
    expected_ratio = (8 / 2) * np.exp(-de / (K_B_CGS * 6000.0))
    np.testing.assert_allclose(n_lev[1, 0] / n_lev[0, 0], expected_ratio, rtol=1e-10)
    # populations sum to the ion density
    i_h1_levels = np.where(np.asarray(dt.level_slot) == 0)[0]
    np.testing.assert_allclose(
        n_lev[i_h1_levels, 0].sum(),
        np.asarray(state.ion_number_density)[0, 0],
        rtol=1e-10,
    )


def test_solar_mixture_sanity():
    ad = build_builtin_atom_data(max_atomic_number=30)
    tables = build_plasma_tables(ad)
    dt = device_tables(tables)
    # sun-like photosphere: T=6400 K, n_H=1.2e17, plus He and metals
    from stardis_tpu.io.abundances import ASPLUND_2009

    t = np.array([6400.0])
    n_h = 1.2e17
    n_elem = np.array(
        [[n_h * 10 ** (ASPLUND_2009.get(z, -99) - 12.0)] for z in tables.zs]
    )
    state = solve_lte(jnp.asarray(t), jnp.asarray(n_elem), dt)
    n_e = float(np.asarray(state.electron_densities)[0])
    # solar photosphere: n_e/n_H ~ 1e-4 (metal electron donors dominate)
    assert 1e-5 < n_e / n_h < 1e-3
    # H mostly neutral
    h_neutral_frac = float(np.asarray(state.ion_number_density)[0, 0]) / n_h
    assert h_neutral_frac > 0.99
    # H- density positive and far smaller than n_HI
    h_minus = float(np.asarray(state.h_minus_density)[0])
    assert 0 < h_minus < 1e-6 * n_h
    # charge conservation across all elements
    slot_charge = np.asarray(tables.slot_ion, dtype=float)
    total_charge = (
        np.asarray(state.ion_number_density)[:, 0] * slot_charge
    ).sum()
    np.testing.assert_allclose(total_charge, n_e, rtol=1e-6)


def test_cool_and_hot_extremes_are_finite():
    ad = build_builtin_atom_data(max_atomic_number=30)
    tables = build_plasma_tables(ad)
    dt = device_tables(tables)
    t = np.array([2500.0, 3000.0, 25000.0, 50000.0])
    n_elem = np.tile(np.array([[1e16], [1e15], [1e12]]), (1, 4))
    tables3 = build_plasma_tables(build_builtin_atom_data(max_atomic_number=3))
    dt3 = device_tables(tables3)
    state = solve_lte(jnp.asarray(t), jnp.asarray(n_elem), dt3)
    for field in state:
        assert np.isfinite(np.asarray(field)).all()
    # at 50000 K hydrogen is fully ionized
    frac_ion = np.asarray(state.ion_number_density)[1, -1] / 1e16
    assert frac_ion > 0.99


def test_float32_stability():
    """The log-space formulation must survive f32 (TPU default)."""
    ad = build_builtin_atom_data(max_atomic_number=5)
    tables = build_plasma_tables(ad)
    dt = device_tables(tables, dtype=jnp.float32)
    t = np.array([3000.0, 6000.0, 12000.0], dtype=np.float32)
    n_elem = np.full((tables.n_elements, 3), 1e15, dtype=np.float32)
    state = solve_lte(jnp.asarray(t), jnp.asarray(n_elem), dt)
    ne32 = np.asarray(state.electron_densities, dtype=np.float64)

    dt64 = device_tables(tables)
    state64 = solve_lte(
        jnp.asarray(t, dtype=jnp.float64),
        jnp.asarray(n_elem, dtype=jnp.float64),
        dt64,
    )
    ne64 = np.asarray(state64.electron_densities)
    assert np.isfinite(ne32).all()
    np.testing.assert_allclose(ne32, ne64, rtol=2e-3)
