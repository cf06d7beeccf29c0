"""Edge-of-envelope configurations through the full public pipeline.

Distilled from a fuzz sweep (round 4): awkward grid sizes vs the 8-shard
padding and 128-lane alignment, extreme-temperature atmospheres, minimal
quadrature, and step sizes that push windows sub-pixel or grid-wide.
Every case must produce finite, non-negative flux; sharded cases must
match unsharded at 1e-9.
"""

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu import parse_config_to_model
from stardis_tpu import units as u
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.parallel.sharding import make_nu_mesh, shard_spectrum
from stardis_tpu.pipeline import (
    build_simulation_plan,
    line_window_tiers,
    run_simulation,
    stage_plasma_and_lines,
)


def _run(tmp_path, tag, teff, n_px, step, zmax, ndev, thetas,
         lines_on=True):
    mp = tmp_path / f"{tag}.mod"
    write_marcs_file(mp, teff=teff)
    cfg = {
        "stardis_config_version": 1.0,
        "atom_data": f"builtin:{zmax}",
        "input_model": {
            "type": "marcs", "fname": str(mp), "final_atomic_number": zmax,
        },
        "opacity": {
            "bf": {"H_I": {}}, "ff": {"H_I": {}}, "rayleigh": ["H"],
            "line": (
                {"disable": False,
                 "broadening": ["radiation", "linear_stark",
                                "quadratic_stark", "van_der_waals"]}
                if lines_on else {"disable": True}
            ),
        },
        "no_of_thetas": thetas,
        "result_options": {},
    }
    cp = tmp_path / f"{tag}.yml"
    cp.write_text(yaml.safe_dump(cfg))
    config, adata, model = parse_config_to_model(cp)
    lam = 6562.8 + np.arange(n_px) * step - n_px * step / 2
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    f_ref, *_ = run_simulation(plan)
    f_ref = np.asarray(f_ref)
    assert np.isfinite(f_ref).all() and (f_ref >= 0).all(), tag
    if ndev and lines_on and len(jax.devices()) >= ndev:
        state, lq = jax.jit(lambda t, n: stage_plasma_and_lines(plan, t, n))(
            jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem)
        )
        tiers = line_window_tiers(plan, lq, state)
        f_sh = shard_spectrum(plan, state, lq, tiers, make_nu_mesh(ndev),
                              chunk=None)
        np.testing.assert_allclose(
            np.asarray(f_sh), f_ref, rtol=1e-9, atol=0, err_msg=tag
        )
    return f_ref


_SHARDED = pytest.mark.slow  # each sharded case pays a 20-30 s shard_map
# compile on the 8-device CPU mesh; they live in the slow tier with
# tests/test_sharding.py


@pytest.mark.parametrize(
    "tag, teff, n_px, step, zmax, ndev, thetas",
    [
        # single-pixel grid: window clamping, padding, RT on one column
        ("one_pixel", 5777.0, 1, 0.05, 5, 0, 3),
        # 7 px over 8 shards: more devices than useful pixels after padding
        pytest.param("seven_px_eight_shards", 5777.0, 7, 0.05, 5, 8, 3,
                     marks=_SHARDED),
        # 129 px: one past the 128-lane alignment boundary
        pytest.param("lane_boundary_129", 5777.0, 129, 0.05, 5, 8, 3,
                     marks=_SHARDED),
        # 63 px over 7 shards: non-power-of-two everything
        pytest.param("odd_63px_7dev", 5777.0, 63, 0.05, 20, 7, 3,
                     marks=_SHARDED),
        # single quadrature angle
        pytest.param("single_theta", 5777.0, 100, 0.05, 5, 4, 1,
                     marks=_SHARDED),
        # hot star: second ions dominate, H lines nearly gone
        ("hot_25kK", 25000.0, 200, 0.05, 8, 0, 5),
        # 2 mA step: every line's window is grid-covering
        pytest.param("fine_step_grid_wide", 5777.0, 400, 0.002, 10, 8, 3,
                     marks=_SHARDED),
        # 2 AA step: every window is sub-pixel (MIN_WINDOW floor)
        pytest.param("coarse_step_subpixel", 5777.0, 200, 2.0, 10, 8, 3,
                     marks=_SHARDED),
    ],
)
def test_edge_configuration(tmp_path, tag, teff, n_px, step, zmax, ndev,
                            thetas):
    _run(tmp_path, tag, teff, n_px, step, zmax, ndev, thetas)


def test_continuum_only_single_pixel(tmp_path):
    _run(tmp_path, "cont_1px", 5777.0, 1, 0.05, 5, 0, 3, lines_on=False)


def test_bare_array_tracing_input_rejected_with_guidance():
    """run_stardis must reject unitless tracing grids with an actionable
    message (bare arrays are ambiguous between AA and Hz)."""
    import numpy as np
    import pytest

    from stardis_tpu.base import run_stardis

    with pytest.raises(TypeError, match="u.Quantity"):
        run_stardis("/nonexistent.yml", np.arange(6560.0, 6570.0, 0.1))
