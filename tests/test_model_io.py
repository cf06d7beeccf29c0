import numpy as np
import pandas as pd

from stardis_tpu import units as u
from stardis_tpu.io.marcs import read_marcs_model
from stardis_tpu.io.synthetic import write_marcs_file


def test_read_synthetic_marcs(synthetic_sun_path, builtin_atom_data):
    model = read_marcs_model(synthetic_sun_path)
    assert not model.spherical
    assert np.isclose(model.metadata["teff"].value, 5777.0)
    assert np.isclose(model.metadata["surface_grav"].value, 10**4.44, rtol=1e-3)
    assert np.isclose(model.metadata["microturbulence"].to(u.km / u.s).value, 1.0)
    assert len(model.data) == 56
    # structure is monotonic in the right direction
    assert (np.diff(model.data.t.values) >= 0).all()  # header order: surface->interior
    assert model.data.t.values[-1] > model.data.t.values[0]

    stellar = model.to_stellar_model(builtin_atom_data, final_atomic_number=30)
    assert stellar.no_of_depth_points == 56
    # after the flip, temperatures run innermost (hot) -> surface (cool)
    temps = np.asarray(stellar.temperatures)
    assert temps[0] > temps[-1]
    # radii increase to the surface
    r = np.asarray(stellar.geometry.r)
    assert (np.diff(r) > 0).all()
    # hydrogen dominates by mass
    mf = stellar.composition.nuclide_mass_fraction
    assert 0.68 < mf.loc[1].iloc[0] < 0.78
    assert 0.2 < mf.loc[2].iloc[0] < 0.3
    # number densities positive, H ~ 1e15-1e18 at the surface
    nd = stellar.composition.elemental_number_density
    assert (nd.values > 0).all()


def test_composition_sources(synthetic_sun_path, builtin_atom_data):
    model = read_marcs_model(synthetic_sun_path)
    comp = model.to_composition(
        builtin_atom_data, final_atomic_number=30, composition_source="asplund_2009"
    )
    mf = comp.nuclide_mass_fraction
    # truncating at Z=30 drops heavy metals then renormalizes; X a bit above 0.7387
    assert 0.70 < mf.loc[1].iloc[0] < 0.76
    comp20 = model.to_composition(
        builtin_atom_data,
        final_atomic_number=30,
        composition_source="asplund_2020",
        helium_mass_frac_Y=0.30,
        heavy_metal_mass_frac_Z=0.02,
    )
    assert comp20.nuclide_mass_fraction.loc[2].iloc[0] > mf.loc[2].iloc[0]


def test_spherical_flag_roundtrip(tmp_path, builtin_atom_data):
    # plane-parallel synthetic file: geometry has no reference_r
    path = tmp_path / "pp.mod"
    write_marcs_file(path, teff=4500.0, logg=4.5, n_depth=40)
    model = read_marcs_model(path)
    geom = model.to_geometry()
    assert geom.reference_r is None
    assert len(np.asarray(geom.r)) == 40


def test_nuclide_rescaling_and_read_stellar_model_override(tmp_path):
    """input_model.nuclide_rescaling_dict multiplies the named elements'
    mass fractions then renormalizes (reference io/base.py:119-130 +
    io/model/util.py:87-114), and read_stellar_model(fname=...) reads a
    different model file under the same config (the grid-scan surface)."""
    import yaml

    from stardis_tpu import parse_config_to_model
    from stardis_tpu.base import read_stellar_model
    from stardis_tpu.io.synthetic import write_marcs_file

    model_path = tmp_path / "sun.mod"
    write_marcs_file(model_path)
    base_cfg = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs",
            "fname": str(model_path),
            "final_atomic_number": 5,
        },
        "opacity": {"line": {"disable": True}},
        "no_of_thetas": 3,
        "result_options": {},
    }
    plain_path = tmp_path / "plain.yml"
    plain_path.write_text(yaml.safe_dump(base_cfg))
    _, _, model_plain = parse_config_to_model(plain_path)

    scaled_cfg = dict(base_cfg)
    scaled_cfg["input_model"] = dict(
        base_cfg["input_model"], nuclide_rescaling_dict={"He": 2.0}
    )
    scaled_path = tmp_path / "scaled.yml"
    scaled_path.write_text(yaml.safe_dump(scaled_cfg))
    config, adata, model_scaled = parse_config_to_model(scaled_path)

    f0 = model_plain.composition.nuclide_mass_fraction
    f1 = model_scaled.composition.nuclide_mass_fraction
    scale = pd.Series(1.0, index=f0.index)
    scale.loc[2] = 2.0
    expected = f0.mul(scale, axis=0)
    expected = expected / expected.sum(axis=0)
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(expected), rtol=1e-12
    )

    # fname override reads a different atmosphere under the same config
    hot_path = tmp_path / "hot.mod"
    write_marcs_file(hot_path, teff=7000.0)
    model_hot = read_stellar_model(config, adata, hot_path)
    assert (
        np.asarray(model_hot.temperatures).max()
        > np.asarray(model_scaled.temperatures).max()
    )
    # the override model gets the same rescaling rules applied
    f_hot = model_hot.composition.nuclide_mass_fraction
    np.testing.assert_allclose(f_hot.sum(axis=0), 1.0, rtol=1e-12)
    ratio = np.asarray(f_hot.loc[2]) / np.asarray(f1.loc[2])
    assert np.all(ratio > 0)
