"""Pallas tier kernel vs the XLA scatter path (interpret mode on CPU; the
same kernel compiles natively on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.opacities.line_kernel import (
    accumulate_line_opacity_tiered,
    assign_window_tiers,
    grid_min_step,
    line_center_indices,
    window_pixels,
)
from stardis_tpu.opacities.pallas_kernel import (
    accumulate_tiered_pallas,
    build_tile_csr,
)


def _setup(n_lines=300, n_depth=12, n_nu=1500, seed=2, strong_fraction=0.05):
    rng = np.random.default_rng(seed)
    nus = np.linspace(4.62e14, 4.52e14, n_nu)
    line_nu = rng.uniform(nus.min(), nus.max(), n_lines)
    doppler = rng.uniform(1e9, 4e9, (n_lines, n_depth))
    gamma = rng.uniform(1e8, 2e9, (n_lines, n_depth))
    alpha = rng.uniform(0.1, 1.0, (n_lines, n_depth)) * 1e-3
    strong = rng.random(n_lines) < strong_fraction
    alpha[strong] *= 1e6
    return nus, line_nu, alpha, gamma, doppler


def test_build_tile_csr():
    centers = np.array([0, 5, 100, 512, 513, 1400])
    starts, counts = build_tile_csr(centers, 1500, tile=512, half_window=64)
    # tile 0 covers [-64, 576): lines 0..4
    assert starts[0] == 0 and counts[0] == 5
    # tile 1 covers [448, 1088): lines at 512, 513
    assert starts[1] == 3 and counts[1] == 2
    # tile 2 covers [960, 1600): the last line
    assert starts[2] == 5 and counts[2] == 1


@pytest.mark.parametrize("window_mode", ["reference", "accuracy"])
def test_pallas_matches_xla_tiered(window_mode):
    nus, line_nu, alpha, gamma, doppler = _setup()
    d_nu = grid_min_step(nus)
    centers = line_center_indices(nus, line_nu)

    win = np.asarray(
        window_pixels(jnp.asarray(alpha), jnp.asarray(gamma),
                      jnp.asarray(doppler), d_nu)
    ).max(axis=1)
    tiers = assign_window_tiers(win, len(nus))
    eps = np.full(alpha.shape[1], 1e-10)

    kwargs = dict(window_mode=window_mode)
    if window_mode == "accuracy":
        kwargs["window_epsilon"] = jnp.asarray(eps)

    xla = accumulate_line_opacity_tiered(
        jnp.asarray(nus, jnp.float32),
        jnp.asarray(line_nu, jnp.float32),
        jnp.asarray(centers),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(gamma, jnp.float32),
        jnp.asarray(doppler, jnp.float32),
        tiers=tiers,
        d_nu=d_nu,
        chunk=64,
        window_epsilon=(
            jnp.asarray(eps)[None, :] if window_mode == "accuracy" else 1e-12
        ),
        window_mode=window_mode,
    )
    pallas = accumulate_tiered_pallas(
        jnp.asarray(nus, jnp.float32),
        jnp.asarray(line_nu, jnp.float32),
        jnp.asarray(centers),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(gamma, jnp.float32),
        jnp.asarray(doppler, jnp.float32),
        tiers=tiers,
        d_nu=d_nu,
        interpret=True,
        **kwargs,
    )
    xla_np = np.asarray(xla)
    pal_np = np.asarray(pallas)
    np.testing.assert_allclose(
        pal_np, xla_np, rtol=2e-5,
        atol=1e-7 * max(xla_np.max(), 1e-30),
    )


def test_pallas_empty_tile_handling():
    """Tiles with zero lines must produce zeros, not garbage."""
    nus = np.linspace(4.62e14, 4.52e14, 1024)
    # all lines clustered at the start of the grid
    line_nu = np.full(5, 4.619e14)
    alpha = np.full((5, 4), 1e-3)
    gamma = np.full((5, 4), 1e9)
    doppler = np.full((5, 4), 2e9)
    centers = line_center_indices(nus, line_nu)
    tiers = [(np.arange(5, dtype=np.int64), 128)]
    out = accumulate_tiered_pallas(
        jnp.asarray(nus, jnp.float32),
        jnp.asarray(line_nu, jnp.float32),
        jnp.asarray(centers),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(gamma, jnp.float32),
        jnp.asarray(doppler, jnp.float32),
        tiers=tiers,
        d_nu=grid_min_step(nus),
        interpret=True,
    )
    out_np = np.asarray(out)
    assert np.isfinite(out_np).all()
    # far half of the grid untouched
    assert np.all(out_np[:, 700:] == 0)
    assert out_np[:, :100].max() > 0
