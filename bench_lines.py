"""Stress benchmark: kurucz/VALD-scale line opacity.

The reference's hot loop (calc_alan_entries) dominates for dense linelists
(SURVEY.md §3.1).  The builtin H list has ~1 line in the Sim100AA window, so
this bench synthesizes a VALD-scale list — N_LINES random metal-like lines
across the window — and times the full pipeline.  Prints one JSON line like
bench.py.

Usage: python bench_lines.py [n_lines]   (default 100000)
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def synth_linelist(atom_data, n_lines, lam_lo=6450.0, lam_hi=6650.0, seed=7):
    """Attach a synthetic VALD-style linelist of weak-to-strong metal lines."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    zs = rng.choice([11, 12, 14, 20, 22, 24, 26, 28], size=n_lines)
    ions = rng.choice([0, 1], size=n_lines, p=[0.7, 0.3])
    wavelength = rng.uniform(lam_lo, lam_hi, n_lines)
    log_gf = rng.uniform(-5.0, 0.5, n_lines)
    e_low = rng.uniform(0.0, 5.0, n_lines)
    e_up = e_low + 12398.42 / wavelength  # eV photon energy
    j_lo = rng.integers(0, 6, n_lines) + 0.5
    atom_data.linelist_atoms = pd.DataFrame(
        {
            "atomic_number": zs,
            "ion_charge": ions,
            "wavelength": wavelength,
            "log_gf": log_gf,
            "e_low": e_low,
            "e_up": e_up,
            "j_lo": j_lo,
            "j_up": j_lo + 1,
            "rad": rng.uniform(6.5, 8.5, n_lines),
            "stark": rng.uniform(-7.0, -5.0, n_lines),
            "waals": rng.uniform(-8.0, -7.0, n_lines),
        }
    )
    return atom_data


def main():
    import jax
    import jax.numpy as jnp
    import yaml

    from stardis_tpu import parse_config_to_model
    from stardis_tpu import units as u
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.pipeline import (
        build_simulation_plan,
        line_window_tiers,
        stage_plasma_and_lines,
        stage_spectrum,
    )

    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    window_mode = sys.argv[2] if len(sys.argv) > 2 else "reference"

    tmpdir = tempfile.mkdtemp(prefix="stardis_bench_lines_")
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
            "line": {
                "disable": False,
                "broadening": [
                    "radiation", "linear_stark", "quadratic_stark",
                    "van_der_waals",
                ],
                "vald_linelist": {
                    "use_linelist": True,
                    "use_vald_broadening": True,
                },
                "window_mode": window_mode,
            },
        },
        "no_of_thetas": 20,
        "result_options": {},
    }
    cfg_path = os.path.join(tmpdir, "config.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(config, fh)
    config, adata, stellar_model = parse_config_to_model(cfg_path)
    synth_linelist(adata, n_lines)

    lambdas = np.arange(6500.0, 6600.0, 0.01)  # Sim100AA grid
    nus = np.asarray(u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(
        config, adata, stellar_model, nus, dtype=np.float32
    )

    temps = jnp.asarray(plan.temperatures)
    n_elem = jnp.asarray(plan.n_elem)
    stage1 = jax.jit(lambda t, n: stage_plasma_and_lines(plan, t, n))
    state, lq = stage1(temps, n_elem)
    jax.block_until_ready(state.electron_densities)

    window = line_window_tiers(plan, lq, state)
    tier_info = {
        k: (v.histogram() if hasattr(v, "histogram") else [(len(i), w) for i, w in v])
        for k, v in window.items()
    }

    stage2 = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=window, chunk=None)[0]
    )
    f_nu = stage2(state, lq)
    jax.block_until_ready(f_nu)

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, lq = stage1(temps, n_elem)
        f_nu = stage2(state, lq)
    jax.block_until_ready(f_nu)
    wall = (time.perf_counter() - t0) / n_iter

    n_in_window = plan.line_data.n_lines
    lines_per_s = n_in_window / wall
    print(
        json.dumps(
            {
                "metric": "line_opacity_lines_per_s_" + window_mode,
                "value": round(lines_per_s, 1),
                "unit": "lines/s full pipeline; %d lines; wall %.3fs; "
                "tiers %s; %s"
                % (n_in_window, wall, tier_info, jax.devices()[0].device_kind),
                "vs_baseline": round(wall, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
