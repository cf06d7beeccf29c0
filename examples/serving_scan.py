"""Serving example: a Teff scan through the compiled-plan cache.

The first request compiles (~10 s); every later atmosphere reuses the
frozen window tiers and compiled executables (~10-40 ms each).

Run:  python examples/serving_scan.py
"""

import sys as _sys
import tempfile
import time
from pathlib import Path as _Path

import numpy as np
import yaml

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from stardis_tpu import parse_config_to_model, units as u
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.serving import SpectralService


def main():
    tmp = tempfile.mkdtemp(prefix="stardis_serving_")
    teffs = np.linspace(5200.0, 6400.0, 7)
    paths = []
    for i, teff in enumerate(teffs):
        path = f"{tmp}/m{i}.mod"
        write_marcs_file(path, teff=float(teff))
        paths.append(path)

    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": paths[0], "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "line": {
                "disable": False,
                "broadening": ["radiation", "van_der_waals"],
                "vald_linelist": {
                    "use_linelist": True, "use_vald_broadening": True,
                },
            },
        },
        "no_of_thetas": 10,
        "result_options": {},
    }
    cfg = f"{tmp}/config.yml"
    with open(cfg, "w") as fh:
        yaml.safe_dump(config, fh)

    lams = u.Quantity(np.arange(5885.0, 5900.0, 0.02), u.AA)
    svc = SpectralService(cfg, lams, tier_margin=1.5)

    for teff, path in zip(teffs, paths):
        _, _, model = parse_config_to_model(
            cfg, add_config_dict={"input_model.fname": path}
        )
        t0 = time.perf_counter()
        out = svc.synthesize(model)
        wall = time.perf_counter() - t0
        depth = 1.0 - out["spectrum_nu"].min() / np.median(out["spectrum_nu"])
        print(
            f"Teff {teff:6.0f} K: Na D depth {depth:.3f}  "
            f"({wall*1e3:7.1f} ms)"
        )
    print(f"stats: {svc.stats}")


if __name__ == "__main__":
    main()
