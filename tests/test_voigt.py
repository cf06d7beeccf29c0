import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from scipy.special import wofz  # noqa: E402

from stardis_tpu.opacities.voigt import faddeeva_real, voigt_profile

SQRT_PI = np.sqrt(np.pi)


def test_faddeeva_at_zero():
    assert np.isclose(float(faddeeva_real(jnp.asarray(0.0), jnp.asarray(0.0))), 1.0)


@pytest.mark.parametrize("y", [1e-4, 0.01, 0.1, 0.5, 1.0, 5.0, 20.0])
def test_faddeeva_matches_scipy_along_strips(y):
    x = np.linspace(-30.0, 30.0, 401)
    ours = np.asarray(faddeeva_real(jnp.asarray(x), jnp.full_like(x, y)))
    exact = wofz(x + 1j * y).real
    # Humlicek w4 is a ~1e-4 relative-accuracy approximation
    np.testing.assert_allclose(ours, exact, rtol=2e-4, atol=1e-6)


def test_voigt_profile_pinned_values():
    # reference test pin: phi(0, 1, 0) = 1/sqrt(pi)
    # (reference tests/test_voigt.py:151-178)
    val = float(voigt_profile(jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.0)))
    assert np.isclose(val, 1.0 / SQRT_PI, rtol=1e-12)


def test_voigt_profile_normalization():
    # integral over delta_nu of phi d(delta_nu) ~ 1
    dnu = np.linspace(-2000.0, 2000.0, 400001)
    phi = np.asarray(
        voigt_profile(jnp.asarray(dnu), jnp.asarray(10.0), jnp.asarray(5.0))
    )
    integral = np.trapezoid(phi, dnu)
    assert np.isclose(integral, 1.0, rtol=1e-3)


def test_voigt_gaussian_limit():
    # gamma=0: phi = exp(-(dnu/dw)^2)/(sqrt(pi) dw)
    dnu = np.linspace(-5.0, 5.0, 101)
    dw = 1.3
    phi = np.asarray(
        voigt_profile(jnp.asarray(dnu), jnp.asarray(dw), jnp.asarray(0.0))
    )
    expected = np.exp(-((dnu / dw) ** 2)) / (SQRT_PI * dw)
    np.testing.assert_allclose(phi, expected, rtol=2e-4, atol=1e-9)


def test_voigt_float32_consistency():
    dnu = np.linspace(-100.0, 100.0, 1001)
    phi64 = np.asarray(
        voigt_profile(jnp.asarray(dnu), jnp.asarray(3.0), jnp.asarray(2.0))
    )
    phi32 = np.asarray(
        voigt_profile(
            jnp.asarray(dnu, dtype=jnp.float32),
            jnp.asarray(3.0, dtype=jnp.float32),
            jnp.asarray(2.0, dtype=jnp.float32),
        )
    )
    np.testing.assert_allclose(phi32, phi64, rtol=5e-4, atol=1e-8)
