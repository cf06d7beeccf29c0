import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.opacities.line_kernel import (
    accumulate_line_opacity,
    accumulate_line_opacity_blocked,
    accumulate_line_opacity_reference,
    assign_window_tiers_blocked,
    choose_window,
    grid_min_step,
    line_center_indices,
    window_pixels,
)


def _random_setup(n_lines=37, n_depth=5, n_nu=400, seed=0, strong=False):
    rng = np.random.default_rng(seed)
    # descending frequency grid, like the real pipeline (lambda ascending)
    nus = np.linspace(4.6e14, 4.5e14, n_nu)
    line_nu = rng.uniform(nus.min(), nus.max(), n_lines)
    doppler = rng.uniform(1e9, 5e9, (n_lines, n_depth))
    gamma = rng.uniform(1e8, 2e9, (n_lines, n_depth))
    scale = 1e-2 if strong else 1e-12
    alpha = rng.uniform(0.1, 1.0, (n_lines, n_depth)) * scale
    return nus, line_nu, alpha, gamma, doppler


@pytest.mark.parametrize("strong", [False, True])
def test_kernel_matches_numpy_oracle(strong):
    nus, line_nu, alpha, gamma, doppler = _random_setup(strong=strong)
    d_nu = grid_min_step(nus)
    centers = line_center_indices(nus, line_nu)
    win_est = np.maximum(10, (gamma + doppler) * alpha / d_nu * 20).max()
    window = choose_window(win_est, len(nus))

    result = accumulate_line_opacity(
        jnp.asarray(nus),
        jnp.asarray(line_nu),
        jnp.asarray(centers),
        jnp.asarray(alpha),
        jnp.asarray(gamma),
        jnp.asarray(doppler),
        window=window,
        d_nu=d_nu,
        chunk=16,
    )
    oracle = accumulate_line_opacity_reference(nus, line_nu, alpha, gamma, doppler)
    np.testing.assert_allclose(np.asarray(result), oracle, rtol=5e-4, atol=1e-30)


def test_kernel_zero_lines():
    nus = np.linspace(4.6e14, 4.5e14, 100)
    out = accumulate_line_opacity(
        jnp.asarray(nus),
        jnp.zeros(0),
        jnp.zeros(0, dtype=int),
        jnp.zeros((0, 4)),
        jnp.zeros((0, 4)),
        jnp.zeros((0, 4)),
        window=128,
        d_nu=grid_min_step(nus),
    )
    assert out.shape == (4, 100)
    assert np.all(np.asarray(out) == 0)


def test_kernel_chunk_invariance():
    nus, line_nu, alpha, gamma, doppler = _random_setup(n_lines=50)
    d_nu = grid_min_step(nus)
    centers = line_center_indices(nus, line_nu)
    window = choose_window(200, len(nus))
    args = (
        jnp.asarray(nus),
        jnp.asarray(line_nu),
        jnp.asarray(centers),
        jnp.asarray(alpha),
        jnp.asarray(gamma),
        jnp.asarray(doppler),
    )
    r1 = accumulate_line_opacity(*args, window=window, d_nu=d_nu, chunk=7)
    r2 = accumulate_line_opacity(*args, window=window, d_nu=d_nu, chunk=50)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-12)


@pytest.mark.parametrize("strong", [False, True])
@pytest.mark.parametrize("block", [3, 8])
def test_blocked_kernel_matches_numpy_oracle(strong, block):
    # n_depth deliberately not a multiple of block to exercise depth padding
    nus, line_nu, alpha, gamma, doppler = _random_setup(
        n_lines=37, n_depth=13, strong=strong
    )
    d_nu = grid_min_step(nus)
    centers = line_center_indices(nus, line_nu)
    win = np.asarray(
        window_pixels(jnp.asarray(alpha), jnp.asarray(gamma),
                      jnp.asarray(doppler), d_nu)
    )
    blocked = assign_window_tiers_blocked(win, len(nus), block=block)
    assert blocked.n_blocks == int(np.ceil(13 / block))

    result = accumulate_line_opacity_blocked(
        jnp.asarray(nus),
        jnp.asarray(line_nu),
        jnp.asarray(centers),
        jnp.asarray(alpha),
        jnp.asarray(gamma),
        jnp.asarray(doppler),
        blocked=blocked,
        d_nu=d_nu,
        chunk=16,
    )
    oracle = accumulate_line_opacity_reference(nus, line_nu, alpha, gamma, doppler)
    np.testing.assert_allclose(np.asarray(result), oracle, rtol=5e-4, atol=1e-30)


def test_blocked_exact_partition_vs_single_window():
    """Blocked tiers must reproduce the single-window kernel exactly (up to
    summation order): the partition over (line, depth, pixel) is exact."""
    nus, line_nu, alpha, gamma, doppler = _random_setup(n_lines=50, n_depth=12)
    d_nu = grid_min_step(nus)
    centers = line_center_indices(nus, line_nu)
    win = np.asarray(
        window_pixels(jnp.asarray(alpha), jnp.asarray(gamma),
                      jnp.asarray(doppler), d_nu)
    )
    window = choose_window(win.max(), len(nus))
    args = (
        jnp.asarray(nus),
        jnp.asarray(line_nu),
        jnp.asarray(centers),
        jnp.asarray(alpha),
        jnp.asarray(gamma),
        jnp.asarray(doppler),
    )
    single = accumulate_line_opacity(*args, window=window, d_nu=d_nu, chunk=50)
    blocked = assign_window_tiers_blocked(win, len(nus), block=4)
    tiered = accumulate_line_opacity_blocked(
        *args, blocked=blocked, d_nu=d_nu, chunk=16
    )
    np.testing.assert_allclose(
        np.asarray(tiered), np.asarray(single), rtol=1e-12, atol=1e-300
    )


def test_line_center_indices_descending_grid():
    nus = np.array([5.0, 4.0, 3.0, 2.0, 1.0]) * 1e14
    # a line at 3.5e14 sits between indices 1 (4e14) and 2 (3e14)
    centers = line_center_indices(nus, np.array([3.5e14]))
    assert centers[0] in (2,)  # reference convention: len - searchsorted


@pytest.mark.parametrize("strong", [False, True])
def test_split_dense_matches_numpy_oracle(strong):
    """The split dense path (region-I wings + panel-grouped full-Voigt
    cores) must reproduce the oracle exactly like the plain dense path:
    beyond the core, |x| > 15.5 guarantees the branchless kernel would
    select region I anyway."""
    from stardis_tpu.opacities.line_kernel import (
        accumulate_line_opacity_blocked,
        assign_window_tiers_blocked,
    )

    # larger grid so the dense tier takes the split path (n_nu >= 4*panel)
    nus, line_nu, alpha, gamma, doppler = _random_setup(
        n_lines=30, n_depth=12, n_nu=1500, strong=strong
    )
    d_nu = grid_min_step(nus)
    centers = line_center_indices(nus, line_nu)
    win = np.asarray(
        window_pixels(jnp.asarray(alpha), jnp.asarray(gamma),
                      jnp.asarray(doppler), d_nu)
    )
    blocked = assign_window_tiers_blocked(win, len(nus), block=4)
    blocked.core_half = int(np.ceil(15.5 * doppler.max() / d_nu)) + 2
    args = (
        jnp.asarray(nus),
        jnp.asarray(line_nu),
        jnp.asarray(centers),
        jnp.asarray(alpha),
        jnp.asarray(gamma),
        jnp.asarray(doppler),
    )
    split = accumulate_line_opacity_blocked(
        *args, blocked=blocked, d_nu=d_nu, chunk=16,
        center_idx_host=centers,
    )
    plain = accumulate_line_opacity_blocked(
        *args, blocked=blocked, d_nu=d_nu, chunk=16,
        center_idx_host=None,
    )
    oracle = accumulate_line_opacity_reference(
        nus, line_nu, alpha, gamma, doppler
    )
    np.testing.assert_allclose(np.asarray(split), oracle, rtol=5e-4,
                               atol=1e-30)
    # and agree with the non-split dense path to f64 rounding
    np.testing.assert_allclose(
        np.asarray(split), np.asarray(plain), rtol=1e-12, atol=1e-300
    )
