"""Quickstart: synthesize a solar spectrum around H-alpha.

Mirrors the reference's docs/quickstart notebook using the self-contained
built-in atomic data and a synthetic gray solar atmosphere (this
environment has no network for kurucz data; swap `atom_data` for a
converted carsus HDF file and `fname` for a real MARCS sun.mod when you
have them).

Run:  python examples/quickstart.py [--plot out.png]
"""

import argparse
import sys
from pathlib import Path

# allow `python examples/<name>.py` from a repo checkout
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tempfile
from pathlib import Path

import numpy as np
import yaml

from stardis_tpu import run_stardis
from stardis_tpu import units as u
from stardis_tpu.io.synthetic import write_marcs_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--plot", default=None, help="write a PNG here")
    args = parser.parse_args()

    workdir = Path(tempfile.mkdtemp(prefix="stardis_quickstart_"))
    model_path = workdir / "sun.mod"
    write_marcs_file(model_path, teff=5777.0, logg=4.44)

    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs",
            "fname": str(model_path),
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
            },
        },
        "no_of_thetas": 20,
        "result_options": {},
    }
    config_path = workdir / "stardis_example.yml"
    config_path.write_text(yaml.safe_dump(config))

    tracing_lambdas = u.Quantity(np.arange(6540.0, 6590.0, 0.01), u.AA)
    sim = run_stardis(config_path, tracing_lambdas)

    lam = np.asarray(sim.lambdas)
    flux = np.asarray(sim.spectrum_lambda)
    core = flux[np.abs(lam - 6564.6) < 0.3].min()
    continuum = flux[np.abs(lam - 6564.6) > 15].mean()
    print(f"spectrum: {len(lam)} points, {lam.min():.1f}-{lam.max():.1f} AA")
    print(f"continuum F_lambda ~ {continuum:.3e} erg/s/cm^2/AA")
    print(f"H-alpha core depth: {100 * core / continuum:.1f}% of continuum")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(9, 4))
        plt.plot(lam, flux, lw=0.7)
        plt.xlabel(r"wavelength [$\AA$]")
        plt.ylabel(r"$F_\lambda$ [erg/s/cm$^2$/$\AA$]")
        plt.title("stardis_tpu quickstart: solar H$\\alpha$")
        plt.tight_layout()
        plt.savefig(args.plot, dpi=140)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
