"""CLI entry point (python -m stardis_tpu) — one-shot synthesis from a
config file with HDF5/ASCII outputs and dotted-key overrides."""

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from stardis_tpu.__main__ import main as cli_main


@pytest.fixture()
def config_path(tmp_path):
    from stardis_tpu.io.synthetic import write_marcs_file

    model_path = tmp_path / "sun.mod"
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs",
            "fname": str(model_path),
            "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 4,
        "result_options": {},
    }
    path = tmp_path / "config.yml"
    path.write_text(yaml.safe_dump(config))
    return str(path)


def test_cli_synthesis_and_outputs(config_path, tmp_path, capsys):
    h5 = tmp_path / "spec.h5"
    txt = tmp_path / "spec.txt"
    rc = cli_main(
        [
            config_path,
            "--lambda", "6560:6570:0.1",
            "--output", str(h5),
            "--ascii", str(txt),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "synthesized 100 points" in out

    import h5py

    with h5py.File(h5) as f:
        assert f.attrs["format"] == "stardis_tpu_output_v1"
        lam = f["spectrum/lambdas"][...]
        flam = f["spectrum/spectrum_lambda"][...]
    assert lam.shape == (100,) and np.isfinite(flam).all()
    assert (flam > 0).all()

    data = np.loadtxt(txt)
    assert data.shape == (100, 2)
    np.testing.assert_allclose(data[:, 1], flam, rtol=1e-6)


def test_cli_override_disables_lines(config_path, tmp_path, capsys):
    """--set dotted-key overrides reach the config (H-alpha absent when
    lines are disabled -> flat continuum across the window)."""
    txt_on = tmp_path / "on.txt"
    txt_off = tmp_path / "off.txt"
    assert cli_main(
        [config_path, "--lambda", "6560:6566:0.1", "--ascii", str(txt_on)]
    ) == 0
    assert cli_main(
        [
            config_path,
            "--lambda", "6560:6566:0.1",
            "--ascii", str(txt_off),
            "--set", "opacity.line.disable=true",
        ]
    ) == 0
    on = np.loadtxt(txt_on)[:, 1]
    off = np.loadtxt(txt_off)[:, 1]
    # with lines on, H-alpha carves a deep dip; disabled, the window is flat
    assert on.min() < 0.8 * on.max()
    assert off.min() > 0.97 * off.max()


def test_cli_bad_lambda_spec(config_path):
    with pytest.raises(SystemExit):
        cli_main([config_path, "--lambda", "6560"])
    with pytest.raises(SystemExit):
        cli_main([config_path, "--lambda", "6570:6560:0.1"])


def test_cli_grid_scan_and_resume(config_path, tmp_path, capsys):
    """--grid runs a checkpointed library scan over a directory of model
    files; a second invocation resumes (skips) completed chunks."""
    from stardis_tpu.io.synthetic import write_marcs_file

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    for teff in (5000.0, 5777.0, 6500.0):
        write_marcs_file(model_dir / f"t{int(teff)}.mod", teff=teff)
    # stray non-model files must be ignored in directory mode
    (model_dir / "README.txt").write_text("not a model")
    (model_dir / "notes.yml").write_text("a: 1")
    scan = tmp_path / "scan"

    rc = cli_main(
        [
            config_path,
            "--lambda", "6560:6566:0.1",
            "--grid", str(model_dir),
            "--scan-out", str(scan),
            "--batch-size", "2",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "grid scan complete: 3 models" in out
    assert "2 chunk(s) computed" in out

    from stardis_tpu.grid import load_grid

    spectra, nus, labels = load_grid(scan)
    assert spectra.shape == (3, 60) and np.isfinite(spectra).all()
    assert labels[0]["fname"].endswith("t5000.mod")

    # resume: nothing recomputed
    rc = cli_main(
        [
            config_path,
            "--lambda", "6560:6566:0.1",
            "--grid", str(model_dir),
            "--scan-out", str(scan),
            "--batch-size", "2",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "0 chunk(s) computed (+2 resumed)" in out


def test_cli_grid_needs_scan_out(config_path, tmp_path):
    with pytest.raises(SystemExit, match="scan-out"):
        cli_main(
            [config_path, "--lambda", "6560:6566:0.1",
             "--grid", str(tmp_path)]
        )


def test_cli_grid_rejects_segments(config_path, tmp_path):
    # --segments is not plumbed through grid scans; refusing beats
    # silently dropping the user's OOM protection
    with pytest.raises(SystemExit, match="not supported with --grid"):
        cli_main(
            [config_path, "--lambda", "6560:6566:0.1",
             "--grid", str(tmp_path), "--scan-out", str(tmp_path / "o"),
             "--segments", "auto"]
        )


def test_cli_bad_segments_value(config_path):
    with pytest.raises(SystemExit, match="integer or 'auto'"):
        cli_main(
            [config_path, "--lambda", "6560:6566:0.1",
             "--segments", "every"]
        )
