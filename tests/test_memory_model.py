"""Auto-segmentation memory model (util.memory).

The model inverts the measured v5e OOM envelope (docstring in
util/memory.py) to pick a serial segment count; these tests pin its
invariants — a generous budget never segments, a tight budget segments
enough that the per-segment estimate fits, and the chooser is monotonic
in both grid size and budget.  The public-surface behavior
(run_stardis(nu_segments="auto")) is covered in test_full_run.py.
"""

import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from stardis_tpu.util import memory as mem


def _fake_plan(n_nu=1000, n_depth=56, n_thetas=20, n_lines=0, track=False):
    line_data = (
        types.SimpleNamespace(nu=np.ones(n_lines)) if n_lines else None
    )
    return types.SimpleNamespace(
        tracing_nus=np.linspace(5e14, 4e14, n_nu),
        temperatures=np.full(n_depth, 5000.0),
        weights=np.full(n_thetas, 0.1),
        file_sources=[],
        bf=None,
        ff_slots=np.asarray([]),
        rayleigh_species=[],
        disable_electron_scattering=True,
        line_data=line_data,
        molecule_line_data=None,
        track_individual_intensities=track,
    )


def _per_px(plan):
    return mem.per_pixel_bytes(
        len(plan.temperatures),
        len(plan.weights),
        mem.count_alpha_sources(plan),
        plan.track_individual_intensities,
    )


def test_generous_budget_never_segments():
    plan = _fake_plan(n_nu=500_000)
    assert mem.choose_nu_segments(plan, bytes_limit=1 << 50) == 1


def test_tight_budget_segments_and_fits():
    plan = _fake_plan(n_nu=200_000, n_lines=1000, track=True)
    # budget sized so ~1/4 of the grid's variable cost fits per segment
    variable = len(plan.tracing_nus) * _per_px(plan)
    fixed = mem.fixed_overhead_bytes(plan) + mem.WORKSET_BYTES
    budget = int((fixed + variable / 4) / mem.HEADROOM)
    k = mem.choose_nu_segments(plan, bytes_limit=budget)
    assert k > 1
    # the chosen segmentation actually fits the model it came from
    per_seg = -(-len(plan.tracing_nus) // k)
    est = mem.estimate_segment_bytes(
        per_seg,
        len(plan.temperatures),
        len(plan.weights),
        mem.count_alpha_sources(plan),
        plan.track_individual_intensities,
    ) + mem.fixed_overhead_bytes(plan)
    assert est <= mem.HEADROOM * budget * 1.001


def test_monotonic_in_grid_and_budget():
    budgets = [1 << 34, 1 << 33, 1 << 32]
    for n_nu in (50_000, 200_000, 800_000):
        ks = [
            mem.choose_nu_segments(_fake_plan(n_nu=n_nu), bytes_limit=b)
            for b in budgets
        ]
        # tighter budget -> never fewer segments
        assert ks == sorted(ks)
    k_small = mem.choose_nu_segments(
        _fake_plan(n_nu=50_000), bytes_limit=1 << 33
    )
    k_large = mem.choose_nu_segments(
        _fake_plan(n_nu=800_000), bytes_limit=1 << 33
    )
    assert k_large >= k_small


def test_hopeless_budget_returns_1():
    # below the fixed working-set floor segmentation cannot help; the
    # chooser refuses to spin (returns 1 and lets the device report OOM)
    plan = _fake_plan(n_nu=10_000)
    assert mem.choose_nu_segments(plan, bytes_limit=1 << 20) == 1


def test_pathological_segment_count_raises():
    # a budget barely above the working-set floor would want thousands of
    # single-pixel serial executions — refuse with an actionable error
    # instead of silently scheduling them
    plan = _fake_plan(n_nu=600_000)
    fixed = mem.fixed_overhead_bytes(plan) + mem.WORKSET_BYTES
    budget = int((fixed + 3 * _per_px(plan)) / mem.HEADROOM)
    with pytest.raises(ValueError, match="sanity bound"):
        mem.choose_nu_segments(plan, bytes_limit=budget)


def test_env_var_budget(monkeypatch):
    plan = _fake_plan(n_nu=800_000)
    k_default = mem.choose_nu_segments(plan, bytes_limit=1 << 50)
    monkeypatch.setenv("STARDIS_SEGMENT_BUDGET", str(1 << 32))
    k_env = mem.choose_nu_segments(plan)
    assert k_default == 1 and k_env > 1


def test_device_bytes_limit_fallback():
    # CPU backends report no bytes_limit -> the v5e default
    assert mem.device_bytes_limit() >= 1 << 30
