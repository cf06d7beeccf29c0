"""Committed golden-spectrum regression (analogue of the reference's
stardis-regression-data comparison, tests/test_stardis_regression.py).

The golden file is generated from a fully deterministic setup (synthetic
gray atmosphere + builtin atomic data) and committed to the repo; run
  python -m pytest tests/test_golden_regression.py --generate-reference
to regenerate after an *intentional* physics change.
"""

from pathlib import Path

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from stardis_tpu import run_stardis
from stardis_tpu import units as u
from stardis_tpu.util.regression import RegressionData

GOLDEN_DIR = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def golden_output(tmp_path_factory):
    from stardis_tpu.io.synthetic import write_marcs_file

    base = tmp_path_factory.mktemp("golden")
    model_path = base / "sun.mod"
    write_marcs_file(model_path)
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
        "no_of_thetas": 10,
        "result_options": {"return_plasma": True},
    }
    cfg = base / "c.yml"
    cfg.write_text(yaml.safe_dump(config))
    lams = u.Quantity(np.arange(6555.0, 6575.0, 0.1), u.AA)
    return run_stardis(cfg, lams)


def test_golden_spectrum(golden_output, request):
    generate = request.config.getoption("--generate-reference")
    rd = RegressionData(
        GOLDEN_DIR, "solar_halpha", generate=generate, rtol=1e-6
    )
    out = golden_output
    rd.sync_ndarray("lambdas", np.asarray(out.lambdas))
    rd.sync_ndarray("spectrum_nu", np.asarray(out.spectrum_nu))
    rd.sync_ndarray("spectrum_lambda", np.asarray(out.spectrum_lambda))
    plasma = out.stellar_plasma
    rd.sync_ndarray("electron_densities", np.asarray(plasma.electron_densities))
    rd.sync_ndarray("h_minus_density", np.asarray(plasma.h_minus_density))
    rd.sync_ndarray(
        "partition_function_h1", np.asarray(plasma.partition_function)[0]
    )
    rd.flush()
