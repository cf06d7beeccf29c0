"""Sharded == unsharded equivalence — the TPU analogue of the reference's
parallel == serial determinism test (reference tests/test_stardis_full.py:17-27)."""

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu import parse_config_to_model
from stardis_tpu import units as u
from stardis_tpu.parallel.sharding import make_nu_mesh, shard_spectrum
from stardis_tpu.pipeline import (
    build_simulation_plan,
    max_window_pixels,
    run_simulation,
    stage_plasma_and_lines,
)
from stardis_tpu.opacities.line_kernel import choose_window


@pytest.fixture(scope="module")
def solar_plan(tmp_path_factory):
    from stardis_tpu.io.synthetic import write_marcs_file

    base = tmp_path_factory.mktemp("shard")
    model_path = base / "sun.mod"
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs",
            "fname": str(model_path),
            "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "disable_electron_scattering": False,
            "line": {
                "disable": False,
                "broadening": ["radiation", "linear_stark"],
            },
        },
        "no_of_thetas": 3,
        "result_options": {},
    }
    cfg_path = base / "config.yml"
    cfg_path.write_text(yaml.safe_dump(config))
    config, adata, stellar_model = parse_config_to_model(cfg_path)
    lambdas = np.arange(6545, 6585, 0.06)  # 667 points, not divisible by 8
    nus = u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral())
    plan = build_simulation_plan(config, adata, stellar_model, np.asarray(nus))
    return plan


@pytest.mark.parametrize("n_devices", [8])
def test_sharded_equals_unsharded(solar_plan, n_devices):
    plan = solar_plan
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")

    f_ref, *_ = run_simulation(plan)

    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    win_max = max_window_pixels(lq, plan.d_nu)
    window = choose_window(win_max, len(plan.tracing_nus))

    mesh = make_nu_mesh(n_devices)
    f_shard = shard_spectrum(plan, state, lq, window, mesh)

    np.testing.assert_allclose(
        np.asarray(f_shard), np.asarray(f_ref), rtol=1e-10, atol=0
    )


def test_sharded_tiered_windows(solar_plan):
    """Tier-dict windows through the sharded path match the unsharded run."""
    from stardis_tpu.pipeline import line_window_tiers

    plan = solar_plan
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)
    from stardis_tpu.pipeline import stage_spectrum

    f_ref, *_ = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)
    mesh = make_nu_mesh(4)
    f_shard = shard_spectrum(plan, state, lq, tiers, mesh, chunk=None)
    np.testing.assert_allclose(
        np.asarray(f_shard), np.asarray(f_ref), rtol=1e-10, atol=0
    )


def test_sharded_output_is_actually_sharded(solar_plan):
    plan = solar_plan
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    mesh = make_nu_mesh(8)
    f_shard = shard_spectrum(plan, state, lq, 256, mesh)
    # the result's sharding spans all 8 devices along nu
    assert len(f_shard.sharding.device_set) == 8


def test_sharded_individual_intensities(solar_plan):
    """result_options.return_radiation_field parity under sharding
    (reference radiation_field/base.py:64-68): I_nus is returned and
    matches the unsharded tracker exactly."""
    import dataclasses

    from stardis_tpu.pipeline import line_window_tiers, stage_spectrum

    plan = dataclasses.replace(
        solar_plan, track_individual_intensities=True
    )
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)
    f_ref, _, _, i_ref = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)
    mesh = make_nu_mesh(4)
    f_shard, i_shard = shard_spectrum(plan, state, lq, tiers, mesh, chunk=None)
    assert i_shard.shape == i_ref.shape  # [D, N, T]
    np.testing.assert_allclose(
        np.asarray(f_shard), np.asarray(f_ref), rtol=1e-10, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(i_shard), np.asarray(i_ref), rtol=1e-10, atol=0
    )


def test_sharded_accuracy_mode_equals_unsharded(solar_plan):
    """The continuum-based accuracy epsilon is computed once on the full
    grid, so sharded and unsharded accuracy-mode runs must agree exactly."""
    import dataclasses

    from stardis_tpu.pipeline import line_window_tiers, stage_spectrum

    plan = dataclasses.replace(
        solar_plan, window_mode="accuracy", window_epsilon=1e-4
    )
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)
    f_ref, *_ = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)
    mesh = make_nu_mesh(4)
    f_shard = shard_spectrum(plan, state, lq, tiers, mesh, chunk=None)
    np.testing.assert_allclose(
        np.asarray(f_shard), np.asarray(f_ref), rtol=1e-10, atol=0
    )


def test_bucketed_eval_budget_scales(solar_plan):
    """Guard against bucketing regressions: the per-shard eval budget on a
    line-heavy plan must stay well below the unsharded budget (round 2
    shipped every pair to every shard; the meter would read ~1/ndev of
    this bar)."""
    from stardis_tpu.opacities.line_kernel import line_center_indices
    from stardis_tpu.parallel.sharding import (
        _pad_to_multiple,
        shard_eval_stats,
    )
    from stardis_tpu.pipeline import line_window_tiers

    plan = solar_plan
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    window = line_window_tiers(plan, lq, state)
    ndev = 8
    nus_padded, _ = _pad_to_multiple(plan.tracing_nus, ndev)
    centers = {
        "atomic": line_center_indices(nus_padded, plan.line_data.nu)
    }
    st = shard_eval_stats(
        window, centers, len(plan.temperatures), len(nus_padded), ndev
    )
    assert st["unsharded_evals"] > 0
    # every shard must carry less than half the unsharded budget (the
    # round-2 failure mode put the FULL budget on every shard)
    assert max(st["per_shard_evals"]) < 0.5 * st["unsharded_evals"], st


def test_split_dense_core_bucketed_by_core_span():
    """The split-dense core pass must be bucketed by the +-core_half core
    span, not by the (grid-covering) tier window: only the center shard
    plus at most one boundary neighbour carries each pair's full-Voigt
    core work.  Before this rule, every shard ran the core pass for every
    pair of a grid-covering tier (~ndev x redundant work)."""
    from stardis_tpu.opacities.line_kernel import BlockedTiers
    from stardis_tpu.parallel.sharding import bucket_pair_programs_per_shard

    ndev, per_shard = 8, 1024
    n_nu = ndev * per_shard
    rng = np.random.default_rng(0)
    n_pairs = 500
    li = np.arange(n_pairs, dtype=np.int64)
    bi = np.zeros(n_pairs, np.int64)
    centers = rng.integers(0, n_nu, size=n_pairs)
    full = int(np.ceil(2 * n_nu / 128.0) * 128)
    spec = BlockedTiers(
        tiers=[(li, bi, full)], block=8, n_blocks=1, core_half=40
    )
    arrays, metas, blk, n_blocks = bucket_pair_programs_per_shard(
        spec, centers, 8, n_nu, ndev, per_shard
    )
    kinds = [m["kind"] for m in metas]
    assert kinds == ["dense", "panel"], metas
    # wings (region-I, dense): grid-covering, every shard needs every pair
    assert int(arrays[0][2].sum()) == ndev * n_pairs
    # cores: a +-40 px span overlaps at most 2 shards, so total live core
    # schedule entries are bounded by pairs + boundary halo, never ndev x
    core_live = int(arrays[1][2].sum())
    assert n_pairs <= core_live <= 2 * n_pairs, core_live


def test_segmented_equals_unsharded(solar_plan):
    """Single-chip wavelength segmentation (grids beyond HBM) replays the
    sharded partition serially: segmented == unsharded at the sharded
    bar, with one compile across segments."""
    import dataclasses

    from stardis_tpu.parallel.sharding import segmented_spectrum
    from stardis_tpu.pipeline import line_window_tiers, stage_spectrum

    plan = dataclasses.replace(solar_plan, track_individual_intensities=True)
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)
    f_ref, _tot, _op, i_ref = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)

    # 3 segments: 667 px pads to 669, odd per-segment width
    f_seg, i_seg = segmented_spectrum(plan, state, lq, tiers, n_segments=3,
                                      chunk=None)
    np.testing.assert_allclose(
        np.asarray(f_seg), np.asarray(f_ref), rtol=1e-10, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(i_seg), np.asarray(i_ref), rtol=1e-10, atol=0
    )


def test_segmented_collect_opacities_and_walls(solar_plan):
    """collect_opacities streams the per-source opacity grids to host per
    segment: keys and values must match stage_spectrum's exactly (1e-10),
    and segment_walls must receive one positive wall per segment (the
    bench's real-silicon shard-load-balance meter)."""
    from stardis_tpu.parallel.sharding import segmented_spectrum
    from stardis_tpu.pipeline import line_window_tiers, stage_spectrum

    plan = solar_plan
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)
    f_ref, tot_ref, op_ref, _i = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)

    walls = []
    f_seg, i_seg, op_seg, tot_seg = segmented_spectrum(
        plan, state, lq, tiers, n_segments=3, chunk=None,
        collect_opacities=True, segment_walls=walls,
    )
    assert i_seg is None  # solar_plan does not track intensities
    assert len(walls) == 3 and all(w > 0 for w in walls)
    np.testing.assert_allclose(
        np.asarray(f_seg), np.asarray(f_ref), rtol=1e-10, atol=0
    )
    assert set(op_seg.keys()) == set(op_ref.keys())
    for k in op_ref:
        np.testing.assert_allclose(
            np.asarray(op_seg[k]), np.asarray(op_ref[k]),
            rtol=1e-10, atol=0, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(tot_seg), np.asarray(tot_ref), rtol=1e-10, atol=0
    )


def test_segmented_cache_hits_with_padded_file_sources(tmp_path):
    """Round-5 review finding: when the grid needs padding AND file
    opacity sources exist, segmented_spectrum used to rebuild (and
    recompile) per call because the cache key was taken from the
    padded-plan copy.  Two identical calls must now share one cache
    entry (and match the unsegmented spectrum)."""
    import pathlib

    import yaml

    from stardis_tpu import parse_config_to_model
    from stardis_tpu import units as u
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.parallel.batch import _SEG_CACHE
    from stardis_tpu.parallel.sharding import segmented_spectrum
    from stardis_tpu.pipeline import (
        build_simulation_plan,
        line_window_tiers,
        stage_plasma_and_lines,
        stage_spectrum,
    )

    ref_data = pathlib.Path("/root/reference/stardis/data")
    if not ref_data.exists():
        pytest.skip("reference data not mounted")
    model_path = tmp_path / "sun.mod"
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(model_path),
            "final_atomic_number": 5,
        },
        "opacity": {
            "file": {"Hminus_ff": str(ref_data / "h_minus_ff_B1987.dat")},
            "bf": {"H_I": {}},
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 3,
        "result_options": {},
    }
    cfg = tmp_path / "c.yml"
    cfg.write_text(yaml.safe_dump(config))
    config, adata, model = parse_config_to_model(cfg)
    # 50 points / 3 segments -> pad needed
    lam = np.arange(6560.0, 6565.0, 0.1)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)

    before = len(_SEG_CACHE)
    f1 = segmented_spectrum(plan, state, lq, tiers, n_segments=3)
    after_first = len(_SEG_CACHE)
    f2 = segmented_spectrum(plan, state, lq, tiers, n_segments=3)
    assert len(_SEG_CACHE) == after_first == before + 1
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=0)

    f_ref, *_ = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f_ref), rtol=1e-10, atol=0
    )


def test_segmented_accuracy_mode_equals_unsegmented(solar_plan):
    """Accuracy window mode through the segmented partition: the
    continuum-anchored epsilon is computed once on the full grid and
    shipped to every segment, so segmented == unsegmented exactly
    (the sharded-path analogue test exists; this pins the serial
    replay used by run_stardis(nu_segments=...) and segmented
    serving)."""
    import dataclasses

    from stardis_tpu.parallel.sharding import segmented_spectrum
    from stardis_tpu.pipeline import line_window_tiers, stage_spectrum

    plan = dataclasses.replace(
        solar_plan, window_mode="accuracy", window_epsilon=1e-4
    )
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)
    f_ref, *_ = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)
    f_seg = segmented_spectrum(plan, state, lq, tiers, n_segments=5,
                               chunk=None)
    np.testing.assert_allclose(
        np.asarray(f_seg), np.asarray(f_ref), rtol=1e-10, atol=0
    )


@pytest.fixture(scope="module")
def cool_molecular_plan(tmp_path_factory):
    """A 4000 K star with BOTH line sets live (atomic VALD + molecular
    MgH/CO lines) — exercises the dual-key bucketing of the sharded and
    segmented program builders."""
    import pandas as pd

    from stardis_tpu.io.synthetic import write_marcs_file

    base = tmp_path_factory.mktemp("shard_mol")
    mp = base / "cool.mod"
    write_marcs_file(mp, teff=4000.0)
    cfg_path = base / "c.yml"
    cfg_path.write_text(yaml.safe_dump({
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": str(mp), "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "line": {
                "disable": False,
                "broadening": ["radiation"],
                "include_molecules": True,
                "vald_linelist": {"use_linelist": True},
            },
        },
        "no_of_thetas": 3,
        "result_options": {},
    }))
    config, adata, model = parse_config_to_model(cfg_path)
    adata.linelist_molecules = pd.DataFrame({
        "molecule": ["MgH", "CO"],
        "wavelength": [5165.0, 5168.0],
        "log_gf": [0.5, -1.0],
        "e_low": [0.0, 0.1],
        "e_up": [2.4, 2.5],
        "j_lo": [5, 2], "j_up": [6, 3],
        "rad": [7.5, 6.0], "stark": [0.0, 0.0], "waals": [0.0, 0.0],
    })
    lambdas = np.arange(5160.0, 5172.0, 0.02)  # 600 px
    nus = u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral())
    plan = build_simulation_plan(config, adata, model, np.asarray(nus))
    assert plan.molecule_line_data is not None
    assert plan.molecule_line_data.n_lines == 2
    return plan


def test_sharded_and_segmented_with_molecular_lines(cool_molecular_plan):
    """BOTH line sets (atomic + molecular) through the per-shard program
    builder: sharded == segmented == unsharded at 1e-10.  Previously only
    the atomic set ever ran these paths."""
    from stardis_tpu.parallel.sharding import segmented_spectrum
    from stardis_tpu.pipeline import line_window_tiers, stage_spectrum

    plan = cool_molecular_plan
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    assert set(lq.keys()) == {"atomic", "molecular"}
    tiers = line_window_tiers(plan, lq, state)
    f_ref, *_ = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)
    # the molecular lines actually absorb (guard against a silently
    # empty molecular contribution making this test vacuous)
    lq_atomic_only = {"atomic": lq["atomic"]}
    tiers_a = line_window_tiers(plan, lq_atomic_only, state)
    f_no_mol, *_ = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers_a, chunk=None)
    )(state, lq_atomic_only)
    assert np.asarray(f_no_mol - f_ref).max() > 0

    if len(jax.devices()) >= 4:
        from stardis_tpu.parallel.sharding import make_nu_mesh

        f_shard = shard_spectrum(
            plan, state, lq, tiers, make_nu_mesh(4), chunk=None
        )
        np.testing.assert_allclose(
            np.asarray(f_shard), np.asarray(f_ref), rtol=1e-10, atol=0
        )
    f_seg = segmented_spectrum(plan, state, lq, tiers, n_segments=3,
                               chunk=None)
    np.testing.assert_allclose(
        np.asarray(f_seg), np.asarray(f_ref), rtol=1e-10, atol=0
    )


def test_segmented_collect_opacities_molecular_keys(cool_molecular_plan):
    """collect_opacities must carry the molecular per-source grids and
    diagnostics under the same keys stage_spectrum produces."""
    import dataclasses

    from stardis_tpu.parallel.sharding import segmented_spectrum
    from stardis_tpu.pipeline import line_window_tiers, stage_spectrum

    plan = dataclasses.replace(
        cool_molecular_plan, track_individual_intensities=True
    )
    state, lq = jax.jit(
        lambda t, n: stage_plasma_and_lines(plan, t, n)
    )(jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem))
    tiers = line_window_tiers(plan, lq, state)
    _f, _tot, op_ref, _i = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=tiers, chunk=None)
    )(state, lq)
    f_seg, i_seg, op_seg, tot_seg = segmented_spectrum(
        plan, state, lq, tiers, n_segments=3, chunk=None,
        collect_opacities=True,
    )
    assert set(op_seg.keys()) == set(op_ref.keys())
    assert "molecule_alpha_line_at_nu" in op_seg
    assert "molecule_alpha_line_at_nu_gammas" in op_seg
    for k in op_ref:
        np.testing.assert_allclose(
            np.asarray(op_seg[k]), np.asarray(op_ref[k]),
            rtol=1e-10, atol=0, err_msg=k,
        )
