"""Wide-grid stress: full visible spectrum (4000-7000 AA, 150k points) with
a 100k-line synthetic VALD list.

Usage: python bench_wide.py [n_lambda] [reference|accuracy]
Set WIDE_SEGMENTS=K to run the single-chip wavelength segmentation
(parallel.sharding.segmented_spectrum) — required above ~300k points at
20 thetas, where the unsegmented program exceeds v5e HBM.
"""
# full-visible stress: 4000-7000 AA @ 0.02 AA = 150k lambda-points, 100k lines
import sys
import time, os, tempfile
import numpy as np, yaml
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/stardis_jax_cache")
from stardis_tpu import parse_config_to_model, units as u
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.pipeline import (build_simulation_plan, line_window_tiers,
                                  stage_plasma_and_lines, stage_spectrum)
from bench_lines import synth_linelist

tmp = tempfile.mkdtemp(); mp = os.path.join(tmp, "sun.mod"); write_marcs_file(mp)
cfg = {"stardis_config_version": 1.0, "atom_data": "builtin:30",
 "input_model": {"type": "marcs", "fname": mp, "final_atomic_number": 30},
 "opacity": {"bf": {"H_I": {}}, "ff": {"H_I": {}}, "rayleigh": ["H"],
  "line": {"disable": False,
   "broadening": ["radiation", "linear_stark", "quadratic_stark", "van_der_waals"],
   "vald_linelist": {"use_linelist": True, "use_vald_broadening": True},
   "window_mode": (sys.argv[2] if len(sys.argv) > 2 else "reference"),
   "window_epsilon": 1e-4}},
 "no_of_thetas": 20, "result_options": {}}
cp = os.path.join(tmp, "c.yml"); yaml.safe_dump(cfg, open(cp, "w"))
config, adata, model = parse_config_to_model(cp)
synth_linelist(adata, 100_000, lam_lo=3950.0, lam_hi=7050.0)
n_lam = int(sys.argv[1]) if len(sys.argv) > 1 else 150000
lam = np.linspace(4000.0, 7000.0, n_lam)
nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
plan = build_simulation_plan(config, adata, model, nus, dtype=np.float32)
temps = jnp.asarray(plan.temperatures); n_elem = jnp.asarray(plan.n_elem)
s1 = jax.jit(lambda t, n: stage_plasma_and_lines(plan, t, n))
state, lq = s1(temps, n_elem); jax.block_until_ready(state.electron_densities)
w = line_window_tiers(plan, lq, state)
hist = {k: v.histogram() for k, v in w.items()}
segments = int(os.environ.get("WIDE_SEGMENTS", "0"))
if segments > 1:
    from stardis_tpu.parallel.sharding import segmented_spectrum

    s2 = lambda s, q: segmented_spectrum(plan, s, q, w, n_segments=segments,
                                         chunk=None)
else:
    s2 = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=w, chunk=None)[0]
    )
f = s2(state, lq); jax.block_until_ready(f)
t0 = time.perf_counter()
for _ in range(3):
    state, lq = s1(temps, n_elem); f = s2(state, lq)
    jax.block_until_ready(f)  # per-iteration sync: end-only blocking can
    # return before queued axon executions finish (see bench.py)
wall = (time.perf_counter() - t0) / 3
seg_note = f", {segments} segments" if segments > 1 else ""
print(f"full-visible: {len(lam)} lambda x 56 depth, {plan.line_data.n_lines} lines, wall {wall:.2f}s{seg_note}, tiers {hist}")
