"""Batched synthesis of a Teff grid of atmospheres, sharded over devices.

The reference has no multi-model capability at all; here a grid of
atmospheres is one vmapped batch distributed over the device mesh
(BASELINE.json config 5).

Run:  python examples/teff_grid.py          (uses all local devices)
"""

import tempfile
from pathlib import Path

import jax
import numpy as np
import yaml

import sys as _sys
from pathlib import Path as _Path

# allow `python examples/<name>.py` from a repo checkout
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from stardis_tpu import parse_config_to_model
from stardis_tpu import units as u
from stardis_tpu.io.marcs import read_marcs_model
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.parallel.batch import make_batch, make_batch_mesh, run_batch


def main():
    workdir = Path(tempfile.mkdtemp(prefix="stardis_grid_"))
    teffs = np.linspace(4000.0, 9000.0, 16)
    paths = []
    for teff in teffs:
        p = workdir / f"t{int(teff)}.mod"
        write_marcs_file(p, teff=float(teff))
        paths.append(p)

    config_dict = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": str(paths[0]),
            "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 10,
        "result_options": {},
    }
    config_path = workdir / "config.yml"
    config_path.write_text(yaml.safe_dump(config_dict))
    config, adata, model0 = parse_config_to_model(config_path)
    models = [model0] + [
        read_marcs_model(p).to_stellar_model(adata, final_atomic_number=30)
        for p in paths[1:]
    ]

    lams = np.arange(6540.0, 6590.0, 0.05)
    nus = np.asarray(u.Quantity(lams, u.AA).to(u.Hz, u.spectral()))
    plan, batch = make_batch(config, adata, models, nus)

    n_dev = len(jax.devices())
    mesh = make_batch_mesh(n_dev) if len(models) % n_dev == 0 else None
    f_nu = run_batch(plan, batch, mesh=mesh)
    emergent = np.asarray(f_nu)[:, -1, :]

    print(f"{len(models)} atmospheres x {len(lams)} wavelengths "
          f"on {n_dev} device(s)")
    for teff, spec in zip(teffs, emergent):
        print(f"Teff {teff:6.0f} K: mean F_nu {spec.mean():.3e} erg/s/cm^2/Hz")


if __name__ == "__main__":
    main()
