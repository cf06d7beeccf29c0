import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.constants import (
    A0_CGS,
    C_CGS,
    E_ESU,
    H_CGS,
    K_B_CGS,
    RYDBERG_ENERGY,
    VACUUM_ELECTRIC_PERMITTIVITY,
)
from stardis_tpu.opacities.broadening import (
    calc_doppler_width,
    calc_gamma,
    calc_gamma_linear_stark,
    calc_gamma_quadratic_stark,
    calc_gamma_van_der_waals,
    calc_n_effective,
    calc_vald_stark_gamma,
    calc_vald_vdW,
)

C4_PREFACTOR = (E_ESU**2 * A0_CGS**3) / (36.0 * H_CGS * VACUUM_ELECTRIC_PERMITTIVITY)


def test_doppler_width_unit_values():
    # nu=c, T=0.5, m=k_B  ->  1.0 (reference test_broadening.py:40-55)
    assert np.isclose(
        float(calc_doppler_width(C_CGS, 0.5, K_B_CGS, 0.0)), 1.0
    )
    # with microturbulence xi: nu/c * sqrt(2kT/m + xi^2)
    val = float(calc_doppler_width(C_CGS, 0.5, K_B_CGS, 1.0))
    assert np.isclose(val, np.sqrt(2.0))


def test_n_effective():
    assert np.isclose(float(calc_n_effective(1.0, RYDBERG_ENERGY, 0.0)), 1.0)
    # H n=2 level: chi - E = Ry/4 -> n_eff = 2
    assert np.isclose(
        float(calc_n_effective(1.0, RYDBERG_ENERGY, 0.75 * RYDBERG_ENERGY)), 2.0
    )
    # He II scaling: Z=2
    assert np.isclose(float(calc_n_effective(2.0, RYDBERG_ENERGY, 0.0)), 2.0)


def test_gamma_linear_stark():
    # n_u - n_l < 1.5 -> a1 = 0.642
    val = float(calc_gamma_linear_stark(2.0, 1.0, 1.0))
    assert np.isclose(val, 0.6 * 0.642 * 3.0)
    # n_u - n_l >= 1.5 -> a1 = 1
    val = float(calc_gamma_linear_stark(3.0, 1.0, 8.0))
    assert np.isclose(val, 0.6 * 1.0 * 8.0 * 4.0)


def test_gamma_quadratic_stark_unit_value():
    # inputs chosen so the result is 1.0 (reference test_broadening.py:360-402)
    n_e = 1.0e-19 / K_B_CGS * (36 * C4_PREFACTOR) ** (-2.0 / 3.0)
    val = float(calc_gamma_quadratic_stark(1.0, 1.0, 0.0, n_e, 1.0))
    assert np.isclose(val, 1.0)


def test_gamma_van_der_waals_pinned_value():
    # pinned value from reference test_broadening.py:455-530
    t = np.pi / 8 / K_B_CGS / 17 ** (1.0 / 0.3)
    h_density = (3.0 * 6.46e-34) ** (-0.4)
    val = float(calc_gamma_van_der_waals(1.0, 1.0, 0.0, t, h_density))
    assert np.isclose(val, 13582529.79905836)


def test_calc_gamma_aggregator_shapes_and_h_mask():
    L, D = 4, 3
    atomic_number = jnp.asarray([[1], [1], [2], [26]])
    ion_number = jnp.ones((L, 1))
    chi = jnp.full((L, 1), RYDBERG_ENERGY)
    e_up = jnp.full((L, 1), 0.75 * RYDBERG_ENERGY)
    e_lo = jnp.zeros((L, 1))
    a_ul = jnp.full((L, 1), 1e8)
    n_e = jnp.full(D, 1e13)
    t = jnp.full(D, 6000.0)
    n_h = jnp.full(D, 1e17)

    gam = calc_gamma(
        atomic_number, ion_number, chi, e_up, e_lo, a_ul, n_e, t, n_h
    )
    assert gam.shape == (L, D)
    # hydrogen rows get linear Stark on top; helium/iron rows don't
    g = np.asarray(gam)
    assert g[0, 0] == g[1, 0]
    assert g[0, 0] > g[2, 0]
    # radiation-only config returns A_ul everywhere
    gam_rad = calc_gamma(
        atomic_number, ion_number, chi, e_up, e_lo, a_ul, n_e, t, n_h,
        linear_stark=False, quadratic_stark=False, van_der_waals=False,
    )
    np.testing.assert_allclose(np.asarray(gam_rad), 1e8)


def test_vald_stark_sign_convention():
    n_e = jnp.asarray([1e13])
    t = jnp.asarray([1e4])
    # negative stark -> gamma = n_e * 10^stark
    val = np.asarray(calc_vald_stark_gamma(n_e, jnp.asarray([[-6.0]]), t))
    assert np.isclose(val[0, 0], 1e13 * 1e-6)
    # zero or positive stark -> 0 (missing / hydrogen-broadening flag)
    val = np.asarray(calc_vald_stark_gamma(n_e, jnp.asarray([[0.0]]), t))
    assert val[0, 0] == 0.0
    val = np.asarray(calc_vald_stark_gamma(n_e, jnp.asarray([[2.0]]), t))
    assert val[0, 0] == 0.0


def test_vald_vdw_dispatch():
    t = jnp.asarray([6000.0])
    n_h = jnp.asarray([1.0])
    mass = jnp.asarray([[55.845 * 1.66053906660e-24]])
    chi = jnp.asarray([[RYDBERG_ENERGY]])
    e_up = jnp.asarray([[0.75 * RYDBERG_ENERGY]])
    e_lo = jnp.asarray([[0.0]])
    ion = jnp.asarray([[1.0]])

    def run(vdw):
        return float(
            calc_vald_vdW(
                jnp.asarray([[vdw]]), t, mass, e_up, e_lo, n_h, ion, chi
            )[0, 0]
        )

    # <0: scaled 10^vdW law
    assert np.isclose(run(-7.5), 10**-7.5 * (6000 / 1e4) ** 0.38)
    # ==0: no broadening
    assert run(0.0) == 0.0
    # (0, 20): Unsoeld enhancement x computed vdW
    expected = float(
        calc_gamma_van_der_waals(
            1.0, calc_n_effective(1.0, RYDBERG_ENERGY, 0.75 * RYDBERG_ENERGY),
            calc_n_effective(1.0, RYDBERG_ENERGY, 0.0), 6000.0, 1.0
        )
    )
    assert np.isclose(run(2.5), 2.5 * expected)
    # >=20: ABO packed sigma.alpha -- positive and mass-dependent
    abo = run(250.345)
    assert abo > 0
    lighter = float(
        calc_vald_vdW(
            jnp.asarray([[250.345]]), t, jnp.asarray([[1.008 * 1.66e-24]]),
            e_up, e_lo, n_h, ion, chi,
        )[0, 0]
    )
    assert lighter > abo  # lighter perturbed atom -> faster vbar -> larger gamma
