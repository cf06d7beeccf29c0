"""Benchmark: Sim100AA-shaped workload with a VALD-scale linelist.

Grid mirrors the reference's largest asv workload (benchmarks/run_stardis.py
Sim100AA: 6500-6600 AA @ 0.01 AA = 10,000 lambda points x 56 depth x 20
theta).  The reference's dominant cost is the O(lines x depth x window)
Voigt accumulation (calc_alan_entries, opacities_solvers/base.py:487-592),
so the default workload attaches a 100k-line synthetic VALD list spanning
the window — the builtin H list alone has ~1 line there and would measure
only continuum + transfer.

The reference publishes no absolute numbers — its asv CI only gates
relative regressions with an 1800 s timeout cap (BASELINE.md).
``vs_baseline`` is therefore a LOWER BOUND: achieved cells/s divided by the
cap-implied floor (560,000 cells / 1800 s); the true speedup is higher but
unmeasurable without running the reference.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

N_LINES = int(os.environ.get("BENCH_N_LINES", "100000"))

# Branchless Humlicek-w4 Voigt (opacities/voigt.py) evaluates all four
# regions per point: ~250 f32 FLOPs/eval counting exp/cos as 1 (hand count
# over _cmul/_cdiv/Horner chains), plus ~10 for window masking and the
# scatter-add operand.  The split dense path evaluates far wings with the
# region-I formula only (~55 FLOPs incl. masking).  TPU v5e VPU f32 peak
# ~= 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.9e12 FLOP/s (the
# MXU's 197 TFLOP/s bf16 does not apply to this elementwise workload).
FLOPS_PER_VOIGT_EVAL = 260.0
FLOPS_PER_WING_EVAL = 55.0
V5E_VPU_F32_PEAK = 3.9e12


def build_plan():
    import yaml

    from stardis_tpu import parse_config_to_model
    from stardis_tpu import units as u
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.pipeline import build_simulation_plan
    from bench_lines import synth_linelist

    tmpdir = tempfile.mkdtemp(prefix="stardis_bench_")
    model_path = os.path.join(tmpdir, "sun.mod")
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs",
            "fname": model_path,
            "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "disable_electron_scattering": False,
            "line": {
                "disable": False,
                "broadening": [
                    "radiation",
                    "linear_stark",
                    "quadratic_stark",
                    "van_der_waals",
                ],
                "vald_linelist": {
                    "use_linelist": True,
                    "use_vald_broadening": True,
                },
            },
        },
        "no_of_thetas": 20,
        "result_options": {},
    }
    cfg_path = os.path.join(tmpdir, "config.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(config, fh)
    config, adata, stellar_model = parse_config_to_model(cfg_path)
    if N_LINES:
        synth_linelist(adata, N_LINES, lam_lo=6450.0, lam_hi=6650.0)
    lambdas = np.arange(6500.0, 6600.0, 0.01)  # 10,000 points (Sim100AA grid)
    nus = u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral())
    # f32 on the accelerator — the TPU-native precision
    plan = build_simulation_plan(
        config, adata, stellar_model, np.asarray(nus), dtype=np.float32
    )
    return plan


def tier_histogram(window):
    return {
        k: (v.histogram() if hasattr(v, "histogram") else [(len(i), w) for i, w in v])
        for k, v in window.items()
    }


def voigt_flops(window, n_depth, n_nu):
    """(evals, flops) per pipeline execution, from the tier plan.
    Panelized tiers (window <= grid/4) do 3-panel dense evals per pair
    (full-Voigt cores + region-I wings when split); grid-scale tiers run
    dense/split-dense full-grid evals."""
    from stardis_tpu.opacities.line_kernel import (
        is_dense_tier,
        split_panel,
        use_panelized,
    )

    def ceil128(x):
        return int(np.ceil(max(x, 128) / 128.0) * 128)

    total_evals = 0
    total_flops = 0.0
    for key, tiers in window.items():
        if hasattr(tiers, "histogram"):  # BlockedTiers
            ch = tiers.core_half
            panel = split_panel(ch) if ch else 0
            split = bool(ch) and n_nu >= 4 * panel
            for n, w in tiers.histogram():
                if use_panelized(w, n_nu) and ch:
                    if 4 * ch <= w:
                        core = n * tiers.block * 3 * panel
                        wing = n * tiers.block * 3 * ceil128(w // 2)
                        total_evals += core + wing
                        total_flops += (
                            core * FLOPS_PER_VOIGT_EVAL
                            + wing * FLOPS_PER_WING_EVAL
                        )
                    else:
                        e = n * tiers.block * 3 * ceil128(w // 2)
                        total_evals += e
                        total_flops += e * FLOPS_PER_VOIGT_EVAL
                elif is_dense_tier(w, n_nu):
                    if split:
                        wing = n * tiers.block * n_nu
                        core = n * tiers.block * 3 * panel
                        total_evals += wing + core
                        total_flops += (
                            wing * FLOPS_PER_WING_EVAL
                            + core * FLOPS_PER_VOIGT_EVAL
                        )
                    else:
                        e = n * tiers.block * n_nu
                        total_evals += e
                        total_flops += e * FLOPS_PER_VOIGT_EVAL
                else:
                    e = n * tiers.block * w
                    total_evals += e
                    total_flops += e * FLOPS_PER_VOIGT_EVAL
        else:
            for idx, w in tiers:
                e = len(idx) * n_depth * (
                    n_nu if is_dense_tier(w, n_nu) else w
                )
                total_evals += e
                total_flops += e * FLOPS_PER_VOIGT_EVAL
    return total_evals, total_flops


def main():
    import jax

    # persistent compilation cache: repeated bench runs (and the driver's
    # end-of-round invocation) skip the multi-minute remote XLA compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/stardis_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stardis_tpu.pipeline import (
        line_window_tiers,
        stage_plasma_and_lines,
        stage_spectrum,
    )

    plan = build_plan()
    n_cells = len(plan.tracing_nus) * len(plan.temperatures)
    n_lines = plan.line_data.n_lines if plan.line_data is not None else 0

    temps = jnp.asarray(plan.temperatures)
    n_elem = jnp.asarray(plan.n_elem)

    stage1 = jax.jit(lambda t, n: stage_plasma_and_lines(plan, t, n))
    state, lq = stage1(temps, n_elem)
    jax.block_until_ready(state.electron_densities)

    window = line_window_tiers(plan, lq, state)
    tier_info = tier_histogram(window)
    n_evals, flop_count = voigt_flops(
        window, len(plan.temperatures), len(plan.tracing_nus)
    )

    stage2 = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=window, chunk=None)[0]
    )
    # compile + warmup; keep the compiled object so XLA's own FLOP count
    # can cross-check the hand count (the %-of-peak anchor)
    compiled2 = stage2.lower(state, lq).compile()
    xla_flops = None
    try:
        cost = compiled2.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        xla_flops = float(cost.get("flops", float("nan")))
    except Exception:
        pass
    f_nu = stage2(state, lq)
    jax.block_until_ready(f_nu)

    # steady-state timing of the full pipeline (both stages re-run);
    # BENCH_PROFILE=<dir> additionally captures a jax.profiler trace of
    # one iteration (open with tensorboard/xprof)
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            state, lq = stage1(temps, n_elem)
            f_nu = stage2(state, lq)
            jax.block_until_ready(f_nu)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, lq = stage1(temps, n_elem)
        f_nu = stage2(state, lq)
    jax.block_until_ready(f_nu)
    wall = (time.perf_counter() - t0) / n_iter

    # shard-scaling meter (host-side, analytic): per-shard Voigt-eval
    # budgets under the bucketed wavelength sharding for an 8-device mesh —
    # the only scaling-efficiency evidence a single-chip environment can
    # produce (sharded==unsharded numerics are pinned by tests/test_sharding)
    shard_line = ""
    if isinstance(window, dict) and window:
        from stardis_tpu.opacities.line_kernel import line_center_indices
        from stardis_tpu.parallel.sharding import (
            _pad_to_multiple,
            shard_eval_stats,
        )

        ndev = 8
        nus_padded, _pad = _pad_to_multiple(plan.tracing_nus, ndev)
        centers = {}
        if "atomic" in window:
            centers["atomic"] = line_center_indices(
                nus_padded, plan.line_data.nu
            )
        if "molecular" in window:
            centers["molecular"] = line_center_indices(
                nus_padded, plan.molecule_line_data.nu
            )
        st = shard_eval_stats(
            window, centers, len(plan.temperatures), len(nus_padded), ndev
        )
        shard_line = (
            "; 8-shard bucketed eval efficiency %.0f%% "
            "(max/shard %.2e vs unsharded %.2e evals)"
            % (
                100.0 * st["efficiency"],
                max(st["per_shard_evals"]),
                st["unsharded_evals"],
            )
        )

    cells_per_s = n_cells / wall
    lines_per_s = n_lines / wall
    flops = flop_count / wall
    mfu = flops / V5E_VPU_F32_PEAK
    xla_line = ""
    if xla_flops and np.isfinite(xla_flops):
        # post-fusion HLO count; transcendental-heavy fusions count ~1
        # FLOP, so this is a hard LOWER bound, far below the hand count —
        # the calibrated anchor is the Voigt speed-of-light comparison in
        # docs/performance.md
        xla_line = (
            "; XLA cost_analysis %.2e HLO-FLOP/exec (post-fusion lower "
            "bound; see docs/performance.md)" % xla_flops
        )
    baseline_floor = 560_000 / 1800.0  # asv Sim100AA timeout-cap floor
    result = {
        "metric": "sim100aa_dense_grid_cells_per_s",
        "value": round(cells_per_s, 1),
        "unit": "(lambda*depth) cells/s; wall %.3fs; %d lines (%.0f lines/s); "
        "%.2e voigt evals -> %.2e FLOP/s by the no-hoisting 260-FLOP/eval "
        "model = %.1f%% of v5e VPU f32 peak (an UPPER-bound FLOP model: XLA "
        "hoists width-dependent subexpressions per row; calibration in "
        "docs/performance.md); "
        "tiers %s; %s%s%s; vs_baseline is a LOWER BOUND (asv 1800s-cap floor)"
        % (
            wall,
            n_lines,
            lines_per_s,
            n_evals,
            flops,
            100.0 * mfu,
            tier_info,
            jax.devices()[0].device_kind,
            shard_line,
            xla_line,
        ),
        "vs_baseline": round(cells_per_s / baseline_floor, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
