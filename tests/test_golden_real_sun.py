"""End-to-end run on the REAL reference inputs: the quickstart solar MARCS
model and the three tabulated cross-section files shipped by the reference
(docs/quickstart/sun.mod, stardis/data/h_minus_bf_W1979.dat,
h_minus_ff_B1987.dat, h2_plus_bf_S1994.dat).  Mirrors the reference
quickstart config (docs/quickstart/stardis_example.yml) and pins the
resulting spectrum + key plasma outputs in the golden store.

Skipped when the reference checkout isn't mounted.  Regenerate with
  python -m pytest tests/test_golden_real_sun.py --generate-reference
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
REFERENCE = Path("/root/reference")
SUN_MOD = REFERENCE / "docs/quickstart/sun.mod"
DATA = REFERENCE / "stardis/data"

pytestmark = pytest.mark.skipif(
    not SUN_MOD.exists(), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def real_sun_output(tmp_path_factory):
    base = tmp_path_factory.mktemp("real_sun")
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs",
            "fname": str(SUN_MOD),
            "final_atomic_number": 30,
        },
        "opacity": {
            "file": {
                "Hminus_bf": str(DATA / "h_minus_bf_W1979.dat"),
                "Hminus_ff": str(DATA / "h_minus_ff_B1987.dat"),
                "H2plus_bf": str(DATA / "h2_plus_bf_S1994.dat"),
            },
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
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
        "result_options": {"return_plasma": True, "return_model": True},
    }
    cfg = base / "quickstart.yml"
    cfg.write_text(yaml.safe_dump(config))
    # the reference quickstart window: H-alpha at 6540-6590 AA
    lams = u.Quantity(np.arange(6540.0, 6590.0, 0.1), u.AA)
    return run_stardis(str(cfg), lams)


def test_real_sun_model_values(real_sun_output):
    """Pinned facts about the real sun.mod (Teff 5777, 56 depth points,
    plane-parallel; reference io/model/tests values)."""
    model = real_sun_output.stellar_model
    assert model.no_of_depth_points == 56
    temps = np.asarray(model.temperatures)
    assert temps[0] > temps[-1]  # inner -> surface ordering
    assert 3000 < temps[-1] < 4800  # solar surface
    assert 9000 < temps[0] < 14000  # tau ~ 20 interior


def test_real_sun_physical_state(real_sun_output):
    plasma = real_sun_output.stellar_plasma
    n_e = np.asarray(plasma.electron_densities)
    assert np.all(n_e > 0)
    # photospheric solar n_e ~ 1e12-1e14 somewhere in the model
    assert (n_e > 1e12).any() and n_e.max() < 1e18
    h_minus = np.asarray(plasma.h_minus_density)
    assert np.all(h_minus >= 0) and h_minus.max() > 1e6


def test_real_sun_halpha_absorbs(real_sun_output):
    out = real_sun_output
    flux = np.asarray(out.spectrum_lambda)
    lam = np.asarray(out.lambdas)
    core = flux[np.abs(lam - 6562.8) < 0.5].min()
    cont = flux[lam > 6585.0].mean()  # red edge, outside the H-alpha wings
    assert core < 0.85 * cont


def test_real_sun_golden(real_sun_output, request):
    generate = request.config.getoption("--generate-reference")
    rd = RegressionData(
        GOLDEN_DIR, "real_sun_quickstart", generate=generate, rtol=1e-6
    )
    out = real_sun_output
    rd.sync_ndarray("lambdas", np.asarray(out.lambdas))
    rd.sync_ndarray("spectrum_nu", np.asarray(out.spectrum_nu))
    rd.sync_ndarray("spectrum_lambda", np.asarray(out.spectrum_lambda))
    plasma = out.stellar_plasma
    rd.sync_ndarray(
        "electron_densities", np.asarray(plasma.electron_densities)
    )
    rd.sync_ndarray("h_minus_density", np.asarray(plasma.h_minus_density))
    rd.sync_ndarray("h2_density", np.asarray(plasma.h2_density))
    rd.sync_ndarray("h2_plus_density", np.asarray(plasma.h2_plus_density))
    rd.sync_ndarray(
        "temperatures", np.asarray(out.stellar_model.temperatures)
    )
    rd.flush()
