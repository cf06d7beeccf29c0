"""Post-processing: rotational + instrumental broadening.

Mirrors the reference's docs/rotation_broadening notebook: synthesize a
spectrum, convolve with Gray's rotational kernel for a given v sin i, then
apply Gaussian instrumental broadening for a spectrograph resolution R.

Run:  python examples/rotation_broadening.py
"""

import tempfile
from pathlib import Path

import numpy as np
import yaml

import sys as _sys
from pathlib import Path as _Path

# allow `python examples/<name>.py` from a repo checkout
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from stardis_tpu import run_stardis
from stardis_tpu import units as u
from stardis_tpu.constants import C_KMS
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.postprocessing import instrumental_broadening, rotation_broadening


def main():
    workdir = Path(tempfile.mkdtemp(prefix="stardis_rot_"))
    model_path = workdir / "star.mod"
    write_marcs_file(model_path, teff=6200.0, logg=4.3)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": str(model_path),
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
    config_path.write_text(yaml.safe_dump(config))

    step_aa = 0.02
    lambdas = u.Quantity(np.arange(6550.0, 6580.0, step_aa), u.AA)
    sim = run_stardis(config_path, lambdas)

    lam = np.asarray(sim.lambdas)
    vel_per_pix = u.Quantity(step_aa / np.mean(lam) * C_KMS, u.km / u.s)

    for v_rot_kms in (0.0, 15.0, 80.0):
        _, f_rot = rotation_broadening(
            vel_per_pix, sim.lambdas, sim.spectrum_lambda,
            v_rot=u.Quantity(v_rot_kms, u.km / u.s),
        )
        _, f_obs = instrumental_broadening(lam, np.asarray(f_rot), resolution=45000)
        flux = np.asarray(f_obs)
        core = flux[np.abs(lam - 6564.6) < 0.3].min()
        cont = flux[np.abs(lam - 6564.6) > 12].mean()
        print(
            f"v sin i = {v_rot_kms:5.1f} km/s, R=45k: "
            f"H-alpha core {100 * core / cont:5.1f}% of continuum"
        )


if __name__ == "__main__":
    main()
