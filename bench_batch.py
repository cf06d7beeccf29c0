"""Batched-atmosphere throughput (BASELINE.json config 5).

Synthesizes a Teff grid of solar-like atmospheres through the vmapped batch
path on the Sim10AA-scale grid (1,000 lambda x 56 depth x 20 theta) with a
synthetic VALD linelist, and reports atmospheres/s.  The reference has no
multi-model path at all — its per-model cost is the lower bound for a
serial loop.

Usage: python bench_batch.py [n_models] [n_lines]   (defaults 16, 20000)
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import yaml

    jax.config.update("jax_compilation_cache_dir", "/tmp/stardis_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stardis_tpu import parse_config_to_model
    from stardis_tpu import units as u
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.parallel.batch import make_batch, run_batch
    from bench_lines import synth_linelist

    n_models = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_lines = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    tmpdir = tempfile.mkdtemp(prefix="stardis_bench_batch_")
    teffs = np.linspace(5000.0, 6500.0, n_models)
    model_paths = []
    for i, teff in enumerate(teffs):
        path = os.path.join(tmpdir, f"m{i}.mod")
        write_marcs_file(path, teff=float(teff))
        model_paths.append(path)

    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs",
            "fname": model_paths[0],
            "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "line": {
                "disable": False,
                "broadening": ["radiation", "van_der_waals"],
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

    config, adata, _ = parse_config_to_model(cfg_path)
    synth_linelist(adata, n_lines, lam_lo=6540.0, lam_hi=6590.0)
    models = []
    for path in model_paths:
        _, _, model = parse_config_to_model(
            cfg_path, add_config_dict={"input_model.fname": path}
        )
        models.append(model)

    lambdas = np.arange(6560.0, 6570.0, 0.01)  # Sim10AA grid
    nus = np.asarray(u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral()))
    plan, batch = make_batch(config, adata, models, nus, dtype=np.float32)

    f = run_batch(plan, batch)  # compile + warmup
    jax.block_until_ready(f)

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        f = run_batch(plan, batch)
        jax.block_until_ready(f)  # per-iteration sync (see bench.py)
    wall = (time.perf_counter() - t0) / n_iter

    print(
        json.dumps(
            {
                "metric": "batch_atmospheres_per_s",
                "value": round(n_models / wall, 2),
                "unit": "atmospheres/s; %d models x Sim10AA grid x %d lines; "
                "wall %.3fs; %s"
                % (n_models, n_lines, wall, jax.devices()[0].device_kind),
                "vs_baseline": round(wall, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
