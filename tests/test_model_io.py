import numpy as np

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
