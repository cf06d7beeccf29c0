"""End-to-end integration tests (the analogue of reference
tests/test_stardis_full.py + conftest fixture chain, using the built-in
atomic dataset and a synthetic solar atmosphere instead of kurucz+sun.mod)."""

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")

from stardis_tpu import run_stardis
from stardis_tpu import units as u


@pytest.fixture(scope="module")
def test_config_path(tmp_path_factory):
    from stardis_tpu.io.synthetic import write_marcs_file

    base = tmp_path_factory.mktemp("e2e")
    model_path = base / "sun.mod"
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
            "disable_electron_scattering": True,
            "line": {"disable": False, "broadening": []},
        },
        "no_of_thetas": 1,
        "result_options": {
            "return_model": True,
            "return_plasma": True,
            "return_radiation_field": True,
        },
    }
    path = base / "config.yml"
    path.write_text(yaml.safe_dump(config))
    return path


@pytest.fixture(scope="module")
def example_stardis_output(test_config_path, example_tracing_nus):
    return run_stardis(test_config_path, example_tracing_nus)


def test_spectrum_shape_and_positivity(example_stardis_output, example_tracing_nus):
    out = example_stardis_output
    n = len(np.asarray(example_tracing_nus))
    assert np.asarray(out.spectrum_nu).shape == (n,)
    assert np.asarray(out.spectrum_lambda).shape == (n,)
    assert (np.asarray(out.spectrum_nu) > 0).all()
    assert np.isfinite(np.asarray(out.spectrum_nu)).all()


def test_spectrum_magnitude_solar(example_stardis_output):
    """Emergent flux should be within a factor ~3 of pi*B_nu(Teff) at 6565 A."""
    from stardis_tpu.constants import C_CGS, H_CGS, K_B_CGS

    nu = np.asarray(example_stardis_output.nus)[0]
    teff = 5777.0
    b_nu = 2 * H_CGS * nu**3 / C_CGS**2 / (np.exp(H_CGS * nu / (K_B_CGS * teff)) - 1)
    f = np.asarray(example_stardis_output.spectrum_nu)[0]
    assert np.pi * b_nu / 3 < f < np.pi * b_nu * 3


def test_halpha_absorption_line(example_stardis_output):
    """The H-alpha window must show the line core darker than the wings."""
    lam = np.asarray(example_stardis_output.lambdas)
    flux = np.asarray(example_stardis_output.spectrum_lambda)
    core = np.abs(lam - 6564.6) < 0.5
    wings = np.abs(lam - 6564.6) > 3.0
    assert flux[core].min() < 0.97 * flux[wings].max()


def test_result_options_attached(example_stardis_output):
    out = example_stardis_output
    assert hasattr(out, "stellar_model")
    assert hasattr(out, "stellar_plasma")
    assert hasattr(out, "stellar_radiation_field")
    rf = out.stellar_radiation_field
    assert rf.F_nu.shape[0] == 56
    assert "alpha_bf" in rf.opacities.opacities_dict
    assert "alpha_ff" in rf.opacities.opacities_dict
    assert "alpha_line_at_nu" in rf.opacities.opacities_dict
    # electron scattering disabled -> zeros
    assert np.all(np.asarray(rf.opacities.opacities_dict["alpha_electron"]) == 0)


def test_config_overrides(test_config_path, example_tracing_nus):
    out = run_stardis(
        test_config_path,
        example_tracing_nus,
        add_config_dict={"opacity.line.disable": True},
    )
    # with lines disabled the spectrum is a smooth monotonic continuum
    flux = np.asarray(out.spectrum_lambda)
    assert (np.diff(flux) < 0).all() or (np.diff(flux) > 0).all()
    assert flux.std() / flux.mean() < 0.01


def test_broadening_configs_change_line_width(test_config_path, example_tracing_nus):
    out_narrow = run_stardis(test_config_path, example_tracing_nus)
    out_broad = run_stardis(
        test_config_path,
        example_tracing_nus,
        add_config_dict={
            "opacity.line.broadening": [
                "radiation",
                "linear_stark",
                "quadratic_stark",
                "van_der_waals",
            ]
        },
    )
    f_n = np.asarray(out_narrow.spectrum_lambda)
    f_b = np.asarray(out_broad.spectrum_lambda)
    lam = np.asarray(out_narrow.lambdas)
    wing = np.abs(lam - 6564.6) > 2.0
    # pressure broadening moves absorption into the wings
    assert f_b[wing].mean() < f_n[wing].mean()


def test_run_stardis_segmented_equals_direct(test_config_path,
                                             example_tracing_nus):
    """run_stardis(nu_segments=K) — the grids-beyond-HBM path through the
    public entry point — matches the direct run at 1e-10, including the
    per-angle intensities AND the per-source opacity grids under
    return_radiation_field (the reference always retains the grids when
    asked, radiation_field/base.py:71-117; the segmented path assembles
    them host-side per segment)."""
    opts = {"result_options.return_radiation_field": True}
    direct = run_stardis(test_config_path, example_tracing_nus,
                         add_config_dict=opts)
    seg = run_stardis(test_config_path, example_tracing_nus,
                      add_config_dict=opts, nu_segments=3)
    np.testing.assert_allclose(
        np.asarray(seg.spectrum_nu), np.asarray(direct.spectrum_nu),
        rtol=1e-10, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(seg.stellar_radiation_field.I_nus),
        np.asarray(direct.stellar_radiation_field.I_nus),
        rtol=1e-10, atol=0,
    )
    # per-source opacity grids: identical keys AND values (1e-10)
    op_d = direct.stellar_radiation_field.opacities.opacities_dict
    op_s = seg.stellar_radiation_field.opacities.opacities_dict
    assert set(op_s.keys()) == set(op_d.keys()) and op_d
    for k in op_d:
        np.testing.assert_allclose(
            np.asarray(op_s[k]), np.asarray(op_d[k]), rtol=1e-10, atol=0,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(seg.stellar_radiation_field.opacities.total_alphas),
        np.asarray(direct.stellar_radiation_field.opacities.total_alphas),
        rtol=1e-10, atol=0,
    )


def test_run_stardis_segmented_without_radiation_field(test_config_path,
                                                       example_tracing_nus):
    """Without return_radiation_field the segmented path skips the host
    opacity assembly entirely (no per-segment transfers) and still
    matches the direct spectrum."""
    direct = run_stardis(test_config_path, example_tracing_nus)
    seg = run_stardis(test_config_path, example_tracing_nus, nu_segments=3)
    np.testing.assert_allclose(
        np.asarray(seg.spectrum_nu), np.asarray(direct.spectrum_nu),
        rtol=1e-10, atol=0,
    )


def test_run_stardis_auto_segments(test_config_path, example_tracing_nus,
                                   monkeypatch, caplog):
    """nu_segments='auto' picks K from the device memory model; with a
    budget squeezed via STARDIS_SEGMENT_BUDGET the tiny test grid takes
    the segmented path (observable: the auto-segmentation log line and
    host-side opacity grids) and still matches the direct run exactly."""
    import logging
    from stardis_tpu import parse_config_to_model
    from stardis_tpu.pipeline import build_simulation_plan
    from stardis_tpu.util import memory as mem

    opts = {"result_options.return_radiation_field": True}
    direct = run_stardis(test_config_path, example_tracing_nus,
                         add_config_dict=opts)

    # compute a budget that forces 2-4 segments for THIS plan's shapes
    config, adata, model = parse_config_to_model(test_config_path, opts)
    nus = np.sort(np.asarray(
        example_tracing_nus.to(u.Hz, u.spectral())
    ))[::-1]
    plan = build_simulation_plan(config, adata, model, nus)
    per_px = mem.per_pixel_bytes(
        len(plan.temperatures), len(plan.weights),
        mem.count_alpha_sources(plan),
        plan.track_individual_intensities,
    )
    variable = len(plan.tracing_nus) * per_px
    fixed = mem.fixed_overhead_bytes(plan) + mem.WORKSET_BYTES
    budget = int((fixed + variable / 3) / mem.HEADROOM)
    assert mem.choose_nu_segments(plan, bytes_limit=budget) > 1

    monkeypatch.setenv("STARDIS_SEGMENT_BUDGET", str(budget))
    with caplog.at_level(logging.INFO, logger="stardis_tpu.base"):
        auto = run_stardis(test_config_path, example_tracing_nus,
                           add_config_dict=opts, nu_segments="auto")
    # the segmented path ran (log line + host-assembled opacity grids,
    # which arrive as numpy arrays rather than device arrays)
    assert any("Auto-segmentation" in r.getMessage() for r in caplog.records)
    auto_dict = auto.stellar_radiation_field.opacities.opacities_dict
    assert auto_dict and all(
        type(v) is np.ndarray for v in auto_dict.values()
    )
    np.testing.assert_allclose(
        np.asarray(auto.spectrum_nu), np.asarray(direct.spectrum_nu),
        rtol=1e-10, atol=0,
    )

    # a generous budget keeps the direct path (opacity grids retained)
    monkeypatch.setenv("STARDIS_SEGMENT_BUDGET", str(1 << 50))
    plain = run_stardis(test_config_path, example_tracing_nus,
                        add_config_dict=opts, nu_segments="auto")
    assert plain.stellar_radiation_field.opacities.opacities_dict != {}

    with pytest.raises(ValueError, match="auto"):
        run_stardis(test_config_path, example_tracing_nus,
                    add_config_dict=opts, nu_segments="every")


def test_stellar_plasma_molecule_surface(test_config_path,
                                         example_tracing_nus):
    """The notebook surface sim.stellar_plasma.molecule_number_density
    (reference flexible_plasma.ipynb) must return a molecule-indexed
    DataFrame when molecules are enabled, raise with guidance when not,
    and keep forwarding raw PlasmaState fields either way."""
    out = run_stardis(
        test_config_path,
        example_tracing_nus,
        add_config_dict={"opacity.line.include_molecules": True},
    )
    frame = out.stellar_plasma.molecule_number_density
    assert "H2" in frame.index and "CO" in frame.index
    assert np.isfinite(frame.values).all() and (frame.values >= 0).all()
    # PlasmaState passthrough (incl. the HDF writer's _asdict)
    assert np.asarray(out.stellar_plasma.electron_densities).ndim == 1
    assert "electron_densities" in out.stellar_plasma._asdict()

    out2 = run_stardis(test_config_path, example_tracing_nus)
    with pytest.raises(ValueError, match="include_molecules"):
        out2.stellar_plasma.molecule_number_density


def test_run_stardis_mesh_matches_direct(test_config_path,
                                         example_tracing_nus):
    """run_stardis(mesh=...) — one-call wavelength-sharded synthesis
    through the public entry point — matches the direct run at 1e-10;
    return_radiation_field on the mesh path is a clear error (no
    sometimes-empty opacities_dict), and mesh + nu_segments>1 is
    rejected."""
    import jax

    from stardis_tpu.parallel.sharding import make_nu_mesh

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    # the module fixture config sets return_radiation_field — turn it
    # off for the mesh comparison (the mesh path refuses it, below)
    opts = {"result_options.return_radiation_field": False}
    direct = run_stardis(test_config_path, example_tracing_nus,
                         add_config_dict=opts)
    mesh = make_nu_mesh(4)
    sharded = run_stardis(test_config_path, example_tracing_nus, mesh=mesh,
                          add_config_dict=opts)
    np.testing.assert_allclose(
        np.asarray(sharded.spectrum_nu), np.asarray(direct.spectrum_nu),
        rtol=1e-10, atol=0,
    )
    with pytest.raises(ValueError, match="return_radiation_field"):
        run_stardis(
            test_config_path, example_tracing_nus, mesh=mesh,
            add_config_dict={"result_options.return_radiation_field": True},
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_stardis(test_config_path, example_tracing_nus, mesh=mesh,
                    nu_segments=3, add_config_dict=opts)
