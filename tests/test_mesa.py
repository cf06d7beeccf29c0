"""MESA reader + end-to-end run on a synthetic MESA profile."""

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from stardis_tpu import run_stardis
from stardis_tpu import units as u
from stardis_tpu.io.mesa import read_mesa_model
from stardis_tpu.io.synthetic import write_mesa_file


@pytest.fixture(scope="module")
def mesa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("mesa") / "star.mod"
    write_mesa_file(p, teff=5777.0, n_shells=80)
    return p


def test_read_mesa_model(mesa_path, builtin_atom_data):
    model = read_mesa_model(mesa_path)
    assert model.metadata["Number of Shells"] == 80
    assert np.isclose(np.asarray(model.metadata["Effective Temperature"]), 5777.0)
    assert np.isclose(np.asarray(model.metadata["Mass"].to(u.M_sun)), 1.0)
    assert len(model.data) == 80

    stellar = model.to_stellar_model(builtin_atom_data, final_atomic_number=30)
    temps = np.asarray(stellar.temperatures)
    assert temps[0] > temps[-1]  # innermost hottest after the flip
    r = np.asarray(stellar.geometry.r)
    assert (np.diff(r) > 0).all()
    # uniform scaled-solar composition
    mf = stellar.composition.nuclide_mass_fraction
    assert np.allclose(mf.loc[1].values, mf.loc[1].iloc[0])


def test_mesa_truncation(mesa_path, builtin_atom_data):
    model = read_mesa_model(mesa_path)
    model.truncate_model(30)
    assert len(model.data) == 30
    stellar = model.to_stellar_model(builtin_atom_data, final_atomic_number=5)
    assert stellar.no_of_depth_points == 30


def test_mesa_end_to_end(mesa_path, tmp_path, example_tracing_nus):
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "mesa",
            "fname": str(mesa_path),
            "final_atomic_number": 5,
            "truncate_to_shell": 40,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": []},
        },
        "no_of_thetas": 3,
        "result_options": {"return_model": True},
    }
    cfg = tmp_path / "mesa.yml"
    cfg.write_text(yaml.safe_dump(config))
    out = run_stardis(cfg, example_tracing_nus)
    flux = np.asarray(out.spectrum_nu)
    assert np.isfinite(flux).all() and (flux > 0).all()
    assert out.stellar_model.no_of_depth_points == 40
