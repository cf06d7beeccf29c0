import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.constants import C_CGS, H_CGS, K_B_CGS
from stardis_tpu.radiation_field.blackbody import blackbody_flux_at_nu
from stardis_tpu.radiation_field.solver import (
    calc_weights,
    calculate_spherical_ray,
    compute_taus,
    gauss_legendre_thetas,
    raytrace,
    single_theta_trace,
)


def numpy_reference_trace(ray_dist, source, taus, inward_rays=False):
    """Direct transcription of the reference sweep semantics
    (radiation_field_solvers/base.py:85-268) as a plain NumPy loop oracle."""
    n_gaps, n_nu = taus.shape
    s = np.asarray(source)
    w0 = np.ones_like(taus)
    w1 = np.ones_like(taus)
    w2 = np.full_like(taus, 2.0)
    small = taus < 5e-4
    mid = (~small) & (taus < 50)
    w0[small] = taus[small] * (1 - taus[small] / 2)
    w1[small] = taus[small] ** 2 * (0.5 - taus[small] / 3)
    w2[small] = taus[small] ** 3 * (1 / 3 - taus[small] / 4)
    e = np.exp(-taus[mid])
    w0[mid] = 1 - e
    w1[mid] = w0[mid] - taus[mid] * e
    w2[mid] = 2 * w1[mid] - taus[mid] ** 2 * e

    I = np.zeros((n_gaps + 1, n_nu))
    if inward_rays:
        for n in range(n_nu):
            for g in range(n_gaps - 1, -1, -1):
                if taus[g, n] == 0 or taus[g - 1, n] == 0:
                    I[g, n] = I[g + 1, n]
                else:
                    second = (
                        w1[g, n]
                        * (
                            (s[g, n] - s[g - 1, n]) * (taus[g, n] / taus[g - 1, n])
                            - (s[g, n] - s[g + 1, n]) * (taus[g - 1, n] / taus[g, n])
                        )
                        / (taus[g, n] + taus[g - 1, n])
                    )
                    third = w2[g, n] * (
                        (s[g - 1, n] - s[g, n]) / taus[g - 1, n]
                        + (s[g + 1, n] - s[g, n]) / taus[g, n]
                    ) / (taus[g, n] + taus[g - 1, n])
                    I[g, n] = (
                        (1 - w0[g, n]) * I[g + 1, n]
                        + w0[g, n] * s[g, n]
                        + second
                        + third
                    )
    for n in range(n_nu):
        for g in range(n_gaps - 1):
            if taus[g, n] == 0:
                I[g + 1, n] = I[g, n]
            else:
                second = (
                    w1[g, n]
                    * (
                        (s[g + 1, n] - s[g + 2, n]) * (taus[g, n] / taus[g + 1, n])
                        - (s[g + 1, n] - s[g, n]) * (taus[g + 1, n] / taus[g, n])
                    )
                    / (taus[g, n] + taus[g + 1, n])
                )
                third = w2[g, n] * (
                    (s[g + 2, n] - s[g + 1, n]) / taus[g + 1, n]
                    + (s[g, n] - s[g + 1, n]) / taus[g, n]
                ) / (taus[g, n] + taus[g + 1, n])
                I[g + 1, n] = (
                    (1 - w0[g, n]) * I[g, n]
                    + w0[g, n] * s[g + 1, n]
                    + second
                    + third
                )
        if taus[-1, n] == 0:
            I[-1, n] = I[-2, n]
        else:
            third = w2[-1, n] * (s[-2, n] - s[-1, n]) / taus[-1, n] ** 2
            I[-1, n] = (
                (1 - w0[-1, n]) * I[-2, n] + w0[-1, n] * s[-1, n] + third
            )
    return I


def _setup(n_depth=20, n_nu=15, seed=1):
    rng = np.random.default_rng(seed)
    alphas = 10 ** rng.uniform(-12, -6, (n_depth, n_nu))
    source = 10 ** rng.uniform(-6, -4, (n_depth, n_nu))
    dist = 10 ** rng.uniform(6, 8, n_depth - 1)
    return alphas, source, dist


def test_weights_regimes():
    taus = jnp.asarray([1e-6, 1e-4, 1e-2, 1.0, 10.0, 49.9, 50.0, 500.0])
    w0, w1, w2 = calc_weights(taus)
    w0, w1, w2 = map(np.asarray, (w0, w1, w2))
    # saturated
    assert w0[-1] == 1.0 and w1[-1] == 1.0 and w2[-1] == 2.0
    assert w0[-2] == 1.0  # tau = 50 exactly -> saturated branch
    # mid-regime closed forms
    t = 1.0
    assert np.isclose(w0[3], 1 - np.exp(-1))
    assert np.isclose(w1[3], (1 - np.exp(-1)) - np.exp(-1))
    # Taylor branch continuous with mid branch near the threshold
    t0 = 5e-4
    w0a = t0 * (1 - t0 / 2)
    w0b = 1 - np.exp(-t0)
    assert abs(w0a - w0b) < 1e-10  # O(tau^3) truncation


@pytest.mark.parametrize("inward", ["none", "chord", "through"])
def test_trace_matches_numpy_oracle(inward):
    alphas, source, dist = _setup()
    taus = np.array(compute_taus(jnp.asarray(alphas), jnp.asarray(dist)))
    if inward == "chord":
        # spherical chord missing the inner shells: innermost gaps zero
        taus[:2] = 0.0
    inward = inward != "none"
    ours = np.asarray(
        single_theta_trace(
            jnp.asarray(source), jnp.asarray(taus), inward_rays=inward,
        )
    )
    oracle = numpy_reference_trace(dist, source, taus, inward_rays=inward)
    np.testing.assert_allclose(ours, oracle, rtol=1e-7, atol=1e-300)  # associative scan reassociates FP


def test_optically_thick_limit_blackbody():
    """Deep in an isothermal optically-thick atmosphere, I -> B_nu(T)."""
    n_depth, n_nu = 30, 8
    t_iso = 6000.0
    nus = np.linspace(4e14, 6e14, n_nu)
    temps = np.full(n_depth, t_iso)
    source = np.asarray(blackbody_flux_at_nu(jnp.asarray(nus), jnp.asarray(temps)))
    alphas = np.full((n_depth, n_nu), 1e-7)
    dist = np.full(n_depth - 1, 1e9)  # tau per gap = 100 -> very thick
    taus = np.array(compute_taus(jnp.asarray(alphas), jnp.asarray(dist)))
    ours = np.asarray(
        single_theta_trace(jnp.asarray(source), jnp.asarray(taus))
    )
    bb = source[0]
    np.testing.assert_allclose(ours[-1], bb, rtol=1e-8)


def test_flux_pi_times_intensity_for_isotropic():
    """The reference quadrature integrates an isotropic I to F = pi I."""
    thetas, weights = gauss_legendre_thetas(20)
    assert np.isclose(weights.sum(), np.pi)


def test_raytrace_shapes_and_spherical_correction():
    alphas, source, dist = _setup(n_depth=12, n_nu=6)
    thetas, weights = gauss_legendre_thetas(5)
    ray_distances = dist[:, None] / np.cos(thetas)[None, :]
    f_nu, i_nus = raytrace(
        jnp.asarray(alphas),
        jnp.asarray(source),
        jnp.asarray(ray_distances),
        jnp.asarray(weights),
        track_individual_intensities=True,
    )
    assert f_nu.shape == (12, 6)
    assert i_nus.shape == (12, 6, 5)
    f_corr, _ = raytrace(
        jnp.asarray(alphas),
        jnp.asarray(source),
        jnp.asarray(ray_distances),
        jnp.asarray(weights),
        photospheric_correction=4.0,
    )
    np.testing.assert_allclose(np.asarray(f_corr), 4.0 * np.asarray(f_nu), rtol=1e-12)


def test_spherical_ray_chords():
    radii = np.array([1.0, 2.0, 3.0, 4.0])
    thetas = np.array([0.0, np.pi / 3])
    dist = calculate_spherical_ray(thetas, radii)
    # theta=0: straight through, chords = diff(radii)
    np.testing.assert_allclose(dist[:, 0], np.diff(radii))
    # theta=pi/3: b = 4 sin(60) = 3.46 -> ray misses shells r<b, those gaps 0
    b = 4 * np.sin(np.pi / 3)
    z = np.sqrt(np.where(radii >= b, radii**2 - b**2, np.nan))
    expected = np.diff(z)
    expected_filled = np.where(np.isnan(expected), 0.0, expected)
    np.testing.assert_allclose(dist[:, 1], expected_filled)
