"""Production flagship flow: full-visible synthesis beyond one chip's HBM.

Synthesizes the entire visible band (4000-7000 AA) on a dense grid
through the public entry point.  At production resolution (0.003 AA =
1,000,000 points) the [depth, N] x theta temporaries exceed a single
v5e's HBM; ``nu_segments="auto"`` asks the calibrated device-memory
model (stardis_tpu.util.memory) for the smallest serial segment count
that fits, and the segmented partition is exact — segmented ==
unsegmented at 1e-10 (tests/test_full_run.py).

Measured on one TPU v5e (bench.py `full_visible_1m_*` keys): 1M points
x 100k VALD lines in ~34 s (K=3 segments, ~1.15x overhead vs a
hypothetical chip with unbounded HBM).  The reference cannot represent
this workload: its asv grids top out at 10,000 points and its arrays
live in host RAM (reference benchmarks/run_stardis.py:149).

Run: python examples/full_visible.py [n_points]   (default 200,000 so
the example finishes quickly on CPU; pass 1000000 on real hardware).
"""

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stardis_tpu import run_stardis
from stardis_tpu import units as u
from stardis_tpu.io.synthetic import write_marcs_file


def main(n_points=200_000):
    tmp = tempfile.mkdtemp(prefix="stardis_fullvis_")
    model = os.path.join(tmp, "sun.mod")
    write_marcs_file(model)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": model, "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "disable_electron_scattering": False,
            "line": {
                "disable": False,
                "broadening": [
                    "radiation", "linear_stark", "quadratic_stark",
                    "van_der_waals",
                ],
            },
        },
        "no_of_thetas": 20,
        "result_options": {},
    }
    cfg = os.path.join(tmp, "config.yml")
    with open(cfg, "w") as fh:
        yaml.safe_dump(config, fh)

    lambdas = u.Quantity(np.linspace(4000.0, 7000.0, n_points), u.AA)
    t0 = time.perf_counter()
    out = run_stardis(cfg, lambdas, nu_segments="auto")
    wall = time.perf_counter() - t0
    flux = np.asarray(out.spectrum_lambda)
    lam = np.asarray(out.lambdas)
    assert np.isfinite(flux).all() and (flux > 0).all()
    # H-alpha must be in absorption against the local continuum
    core = np.abs(lam - 6564.6) < 0.5
    near = (np.abs(lam - 6564.6) < 40.0) & ~core
    assert flux[core].min() < 0.9 * np.median(flux[near])
    print(
        f"{n_points} points, 4000-7000 AA: {wall:.1f} s "
        f"(incl. parse/plan/compile); "
        f"flux range [{flux.min():.3e}, {flux.max():.3e}] erg/s/cm^2/AA; "
        f"H-alpha core depth "
        f"{flux[core].min() / np.median(flux[near]):.2f} of continuum"
    )
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
