"""End-to-end sanity of the builtin metal linelist: a solar synthesis over
the Na D region must show the D1/D2 absorption doublet at the right
wavelengths, with D2 (larger gf) deeper than D1."""

import os
import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")
yaml = pytest.importorskip("yaml")

from stardis_tpu import parse_config_to_model, units as u
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.pipeline import build_simulation_plan, run_simulation


@pytest.fixture(scope="module")
def na_d_run():
    tmpdir = tempfile.mkdtemp(prefix="stardis_nad_")
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
                "broadening": ["radiation", "van_der_waals"],
                "vald_linelist": {
                    "use_linelist": True,
                    "use_vald_broadening": True,
                },
            },
        },
        "no_of_thetas": 10,
        "result_options": {},
    }
    cfg_path = os.path.join(tmpdir, "config.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(config, fh)
    config, adata, model = parse_config_to_model(cfg_path)
    lambdas = np.arange(5880.0, 5905.0, 0.02)
    nus = np.asarray(u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    f_nu, *_ = run_simulation(plan)
    # F_nu rows are depth; surface spectrum on the descending-nu grid maps
    # to ascending lambda
    surface = np.asarray(f_nu)[-1]
    return lambdas, surface


def _depth_at(lambdas, flux, lam0, half=0.5):
    window = (lambdas > lam0 - half) & (lambdas < lam0 + half)
    cont = np.median(flux)
    return 1.0 - flux[window].min() / cont


def test_na_d_doublet_absorbs(na_d_run):
    lambdas, flux = na_d_run
    d2 = _depth_at(lambdas, flux, 5889.95)
    d1 = _depth_at(lambdas, flux, 5895.92)
    assert d2 > 0.2, f"Na D2 depth {d2:.3f} too shallow"
    assert d1 > 0.15, f"Na D1 depth {d1:.3f} too shallow"
    # D2 has ~2x the gf of D1 -> deeper (saturation shrinks but preserves order)
    assert d2 >= d1


def test_na_d_line_centers(na_d_run):
    lambdas, flux = na_d_run
    for lam0 in (5889.95, 5895.92):
        window = (lambdas > lam0 - 0.5) & (lambdas < lam0 + 0.5)
        lam_min = lambdas[window][np.argmin(flux[window])]
        assert abs(lam_min - lam0) < 0.1


def test_continuum_between_lines(na_d_run):
    lambdas, flux = na_d_run
    # far wing near 5902 AA should be close to the pseudo-continuum
    wing = (lambdas > 5901.0) & (lambdas < 5904.0)
    cont = np.median(flux)
    assert flux[wing].min() > 0.9 * cont
