"""End-to-end: spherical geometry and tabulated cross-section files."""

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from stardis_tpu import run_stardis
from stardis_tpu import units as u
from stardis_tpu.io.marcs import read_marcs_model
from stardis_tpu.io.synthetic import write_marcs_file


def _write_hminus_bf_table(path):
    """Wishart-1979 format: wavelength[AA], sigma[cm^2] CSV."""
    lam = np.linspace(2000, 15000, 50)
    # crude bell shape peaking near 8500 AA like the real H- bf curve
    sig = 4e-17 * np.exp(-(((lam - 8500) / 4000.0) ** 2))
    with open(path, "w") as fh:
        fh.write("# synthetic Wishart-format table\n")
        for wl, s in zip(lam, sig):
            fh.write(f"{wl:.1f},{s:.4e}\n")


def _write_hminus_ff_table(path):
    """Bell & Berrington format: lambda x theta table."""
    lam = np.linspace(3000, 12000, 20)
    thetas = np.array([0.5, 1.0, 1.5, 2.0, 2.5])
    with open(path, "w") as fh:
        fh.write("# synthetic B&B-format table\n")
        fh.write("wave, " + ", ".join(f"{t:.1f}" for t in thetas) + "\n")
        for wl in lam:
            vals = 1e-2 * (wl / 5000.0) ** 2 * thetas**1.5
            fh.write(
                f"{wl:.1f} " + " ".join(f"{v:.4e}" for v in vals) + "\n"
            )


def _write_h2plus_bf_table(path):
    """Stancil format: wavelength[nm] x T table with implicit exponents."""
    lam_nm = np.linspace(300, 1200, 15)
    temps = np.array([3000, 5000, 8000, 12000])
    with open(path, "w") as fh:
        fh.write("# synthetic Stancil-format table\n")
        fh.write("nm " + " ".join(str(t) for t in temps) + "\n")
        for wl in lam_nm:
            vals = 0.5 * (wl / 600.0) * np.sqrt(temps / 5000.0)
            fh.write(
                f"{wl:.0f} " + " ".join(f"{v:.2f}" for v in vals) + "\n"
            )


@pytest.fixture(scope="module")
def file_opacity_config(tmp_path_factory):
    base = tmp_path_factory.mktemp("files")
    model_path = base / "sun.mod"
    write_marcs_file(model_path)
    _write_hminus_bf_table(base / "hminus_bf.dat")
    _write_hminus_ff_table(base / "hminus_ff.dat")
    _write_h2plus_bf_table(base / "h2plus_bf.dat")
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(model_path),
            "final_atomic_number": 5,
        },
        "opacity": {
            "file": {
                "Hminus_bf": str(base / "hminus_bf.dat"),
                "Hminus_ff": str(base / "hminus_ff.dat"),
                "H2plus_bf": str(base / "h2plus_bf.dat"),
            },
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 3,
        "result_options": {"return_radiation_field": True},
    }
    path = base / "config.yml"
    path.write_text(yaml.safe_dump(config))
    return path


def test_file_opacities_end_to_end(file_opacity_config, example_tracing_nus):
    out = run_stardis(file_opacity_config, example_tracing_nus)
    opac = out.stellar_radiation_field.opacities.opacities_dict
    assert "alpha_file_Hminus_bf" in opac
    assert "alpha_file_Hminus_ff" in opac
    assert "alpha_file_H2plus_bf" in opac
    # H- bf from the table dominates at H-alpha wavelengths in the photosphere
    a_hm = np.asarray(opac["alpha_file_Hminus_bf"])
    assert (a_hm >= 0).all() and a_hm.max() > 0
    assert np.isfinite(np.asarray(out.spectrum_nu)).all()


def test_spherical_model_end_to_end(tmp_path, example_tracing_nus):
    model_path = tmp_path / "giant.mod"
    # inflated giant: low gravity, large radius -> visible sphericity
    write_marcs_file(
        model_path, teff=4800.0, logg=2.0, spherical=True, radius_cm=2e12
    )
    model = read_marcs_model(model_path)
    assert model.spherical
    assert np.isclose(np.asarray(model.metadata["radius"]), 2e12)

    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(model_path),
            "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": []},
        },
        "no_of_thetas": 5,
        "result_options": {"return_model": True},
    }
    cfg = tmp_path / "c.yml"
    cfg.write_text(yaml.safe_dump(config))
    out = run_stardis(cfg, example_tracing_nus)
    flux = np.asarray(out.spectrum_nu)
    assert np.isfinite(flux).all() and (flux > 0).all()
    # geometry carried through: radii near the configured stellar radius
    r = np.asarray(out.stellar_model.geometry.r)
    assert np.isclose(r[-1], 2e12, rtol=0.1)
    assert out.stellar_model.spherical
