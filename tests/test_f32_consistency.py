"""float32-vs-float64 consistency for the round-2 physics paths
(CLAUDE.md: every new physics path gets an f32-vs-f64 consistency test).

Covers: the dense full-grid accumulation, the depth-blocked tiered kernel,
the continuum-based accuracy epsilon, and the NIST metal partition
functions.  TPU default precision is f32; these pin that the f32 results
track f64 within line-opacity-appropriate tolerances.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.opacities.line_kernel import (
    _accumulate_dense,
    accumulate_line_opacity_blocked,
    assign_window_tiers_blocked,
    grid_min_step,
    line_center_indices,
    window_pixels,
)


def _setup(n_lines=64, n_depth=16, n_nu=512, seed=3):
    rng = np.random.default_rng(seed)
    nus = np.linspace(4.6e14, 4.5e14, n_nu)
    line_nu = rng.uniform(nus.min(), nus.max(), n_lines)
    doppler = rng.uniform(1e9, 5e9, (n_lines, n_depth))
    gamma = rng.uniform(1e8, 2e9, (n_lines, n_depth))
    # mix of weak and strong lines so all tiers populate
    alpha = rng.uniform(0.1, 1.0, (n_lines, n_depth)) * 10 ** rng.uniform(
        -12, -3, (n_lines, 1)
    )
    return nus, line_nu, alpha, gamma, doppler


def _cast(args, dtype):
    return tuple(jnp.asarray(a, dtype) for a in args)


def _center(nus, line_nu):
    """The production callers (pipeline/sharding) shift grid and line
    frequencies by a reference value in float64 BEFORE the dtype cast —
    dnu = grid - line_nu would otherwise lose ~7 digits to cancellation
    of two ~4.5e14 Hz values in f32."""
    nu_ref = float(nus[len(nus) // 2])
    return nus - nu_ref, line_nu - nu_ref


def test_dense_accumulation_f32_tracks_f64():
    nus, line_nu, alpha, gamma, doppler = _setup()
    d_nu = grid_min_step(nus)
    centers = jnp.asarray(line_center_indices(nus, line_nu))
    nus_c, line_nu_c = _center(nus, line_nu)
    out = {}
    for dtype in (jnp.float64, jnp.float32):
        n, l, a, g, d = _cast((nus_c, line_nu_c, alpha, gamma, doppler), dtype)
        eps = jnp.ones(alpha.shape, dtype)
        out[dtype] = np.asarray(
            _accumulate_dense(n, l, centers, a, g, d, eps, d_nu=d_nu,
                              chunk=16)
        )
    _assert_f32_tracks_f64(out[jnp.float32], out[jnp.float64])


def _assert_f32_tracks_f64(f32, f64):
    """Mixed bound: tight relative accuracy where there is signal, plus an
    absolute bound scaled to each depth row's maximum.  The absolute term
    absorbs window-EDGE pixels whose mask membership legitimately flips
    with dtype rounding (the reference's hard window cuts the profile at
    floor(win) pixels; a boundary pixel carries only a far-wing value)."""
    err = np.abs(f32 - f64)
    bound = 5e-4 * np.abs(f64) + 1e-5 * np.abs(f64).max(axis=1, keepdims=True)
    bad = err > bound
    assert not bad.any(), (
        f"{bad.sum()} pixels exceed the f32 consistency bound; "
        f"worst ratio {(err / np.maximum(bound, 1e-300)).max():.2f}"
    )


def test_blocked_tiered_f32_tracks_f64():
    nus, line_nu, alpha, gamma, doppler = _setup(n_depth=13)
    d_nu = grid_min_step(nus)
    centers = jnp.asarray(line_center_indices(nus, line_nu))
    win = np.asarray(
        window_pixels(jnp.asarray(alpha), jnp.asarray(gamma),
                      jnp.asarray(doppler), d_nu)
    )
    blocked = assign_window_tiers_blocked(win, len(nus), block=4)
    nus_c, line_nu_c = _center(nus, line_nu)
    out = {}
    for dtype in (jnp.float64, jnp.float32):
        n, l, a, g, d = _cast((nus_c, line_nu_c, alpha, gamma, doppler), dtype)
        out[dtype] = np.asarray(
            accumulate_line_opacity_blocked(
                n, l, centers, a, g, d, blocked=blocked, d_nu=d_nu, chunk=16
            )
        )
    _assert_f32_tracks_f64(out[jnp.float32], out[jnp.float64])


def test_split_dense_f32_tracks_f64():
    """The split dense path (region-I wings + panel cores, one-hot matmul
    reduction) is a distinct physics path — CLAUDE.md requires its own
    f32-vs-f64 consistency check."""
    from stardis_tpu.opacities.line_kernel import split_core_half

    # grid large enough for the split gate (n_nu >= 4 * panel)
    nus, line_nu, alpha, gamma, doppler = _setup(n_nu=1600, n_depth=13)
    d_nu = grid_min_step(nus)
    centers = line_center_indices(nus, line_nu)
    win = np.asarray(
        window_pixels(jnp.asarray(alpha), jnp.asarray(gamma),
                      jnp.asarray(doppler), d_nu)
    )
    blocked = assign_window_tiers_blocked(win, len(nus), block=4)
    blocked.core_half = split_core_half(doppler.max(), d_nu)
    nus_c, line_nu_c = _center(nus, line_nu)
    out = {}
    for dtype in (jnp.float64, jnp.float32):
        n, l, a, g, d = _cast((nus_c, line_nu_c, alpha, gamma, doppler), dtype)
        out[dtype] = np.asarray(
            accumulate_line_opacity_blocked(
                n, l, jnp.asarray(centers), a, g, d, blocked=blocked,
                d_nu=d_nu, chunk=16, center_idx_host=centers,
            )
        )
    _assert_f32_tracks_f64(out[jnp.float32], out[jnp.float64])


def test_accuracy_epsilon_f32_tracks_f64(synthetic_sun_path):
    import yaml

    from stardis_tpu import parse_config_to_model, units as u
    from stardis_tpu.pipeline import (
        accuracy_epsilon,
        build_simulation_plan,
        stage_plasma_and_lines,
    )
    import tempfile, os

    cfg = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs",
            "fname": str(synthetic_sun_path),
            "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 3,
        "result_options": {},
    }
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "c.yml")
    with open(path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    config, adata, model = parse_config_to_model(path)
    nus = np.asarray(
        u.Quantity(np.arange(6560.0, 6570.0, 0.1), u.AA).to(
            u.Hz, u.spectral()
        )
    )
    eps = {}
    for dtype in (np.float64, np.float32):
        plan = build_simulation_plan(config, adata, model, nus, dtype=dtype)
        state, _ = jax.jit(
            lambda t, n, p=plan: stage_plasma_and_lines(p, t, n)
        )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
        eps[dtype] = np.asarray(accuracy_epsilon(plan, state), dtype=float)
    rel = np.abs(eps[np.float32] - eps[np.float64]) / eps[np.float64]
    assert rel.max() < 2e-3, rel.max()


def test_metal_partition_functions_f32_track_f64():
    from stardis_tpu.atom_data.builtin import build_builtin_atom_data
    from stardis_tpu.atom_data.nist_levels import PUBLISHED_U_5777K_RANGES
    from stardis_tpu.plasma.lte import device_tables, solve_lte
    from stardis_tpu.plasma.tables import build_plasma_tables

    adata = build_builtin_atom_data(30)
    tables = build_plasma_tables(adata)
    temps = np.array([4000.0, 5777.0, 9000.0])
    n_elem = np.full((tables.n_elements, 3), 1e10)
    n_elem[0] = 1e15
    u_by_dtype = {}
    for dtype in (jnp.float64, jnp.float32):
        dt = device_tables(tables, dtype=dtype)
        state = solve_lte(
            jnp.asarray(temps, dtype), jnp.asarray(n_elem, dtype), dt
        )
        u_by_dtype[dtype] = np.asarray(state.partition_function, dtype=float)
    for (z, ion) in PUBLISHED_U_5777K_RANGES:
        slot = tables.slot_of(z, ion)
        rel = np.abs(
            u_by_dtype[jnp.float32][slot] - u_by_dtype[jnp.float64][slot]
        ) / u_by_dtype[jnp.float64][slot]
        assert rel.max() < 1e-4, (z, ion, rel.max())
