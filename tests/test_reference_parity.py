"""Parity checks against the reference implementation's own test DATA files
(real MARCS/MESA models) and its published pinned expectations.

These run only when the read-only reference checkout is mounted (it is in
the development environment; skipped elsewhere).  The pinned values below
are the ones the reference's own test suite asserts
(reference io/model/tests/test_model_io.py:28-124).
"""

from pathlib import Path

import numpy as np
import pytest

REFERENCE_DATA = Path("/root/reference/stardis/io/model/tests/data")

pytestmark = pytest.mark.skipif(
    not REFERENCE_DATA.exists(), reason="reference data not mounted"
)


@pytest.fixture(scope="module")
def marcs_model():
    from stardis_tpu.io.marcs import read_marcs_model

    return read_marcs_model(REFERENCE_DATA / "marcs_test.mod.gz", gzipped=True)


@pytest.fixture(scope="module")
def mesa_model():
    from stardis_tpu.io.mesa import read_mesa_model

    return read_mesa_model(REFERENCE_DATA / "end_core_h_burn.mod")


def test_marcs_reference_pinned_values(marcs_model):
    # reference test_model_io.py:45-69 pins
    assert np.allclose(marcs_model.data.scaled_log_number_fraction_1, 12.0)
    assert np.allclose(
        np.asarray(marcs_model.metadata["surface_grav"]), 10000.0
    )
    assert np.allclose(marcs_model.metadata["x"], 0.73826)
    assert np.allclose(marcs_model.data.depth.iloc[-1], 44610000.0)
    assert np.allclose(marcs_model.data.lgtaur.iloc[0], -5.0)
    assert len(marcs_model.data) == 56
    assert not marcs_model.spherical


def test_marcs_reference_asplund_compositions(marcs_model, builtin_atom_data):
    # reference test_model_io.py:92-124 pins (final_atomic_number=5 config)
    for source, y_in, z_in, x_exp, y_exp in [
        ("asplund_2020", 0.0, 0.0, 1.0, 0.0),
        ("asplund_2020", -99, -99, 0.75428, 0.245713),
        ("asplund_2009", -99, -99, 0.747394, 0.252605),
    ]:
        stellar = marcs_model.to_stellar_model(
            builtin_atom_data,
            final_atomic_number=5,
            composition_source=source,
            helium_mass_frac_Y=y_in,
            heavy_metal_mass_frac_Z=z_in,
        )
        mf = stellar.composition.elemental_mass_fraction
        assert np.allclose(mf.loc[1].iloc[0], x_exp, atol=2e-4), source
        assert np.allclose(mf.loc[2].iloc[0], y_exp, atol=2e-4), source


def test_marcs_reference_model_composition(marcs_model, builtin_atom_data):
    stellar = marcs_model.to_stellar_model(
        builtin_atom_data, final_atomic_number=30
    )
    mf = stellar.composition.nuclide_mass_fraction
    # H-dominated cool dwarf; fractions normalized over available elements
    assert 0.7 < mf.loc[1].iloc[0] < 0.78
    temps = np.asarray(stellar.temperatures)
    assert temps[0] > temps[-1]
    assert np.isclose(temps[-1], 2771.0)  # surface T from the file
    assert np.isclose(temps[0], 7713.4)  # innermost T


def test_mesa_reference_pinned_values(mesa_model):
    # reference test_model_io.py:28-33 pins
    assert mesa_model.metadata["Number of Shells"] == 832
    assert mesa_model.metadata["Model Number"] == 295
    assert len(mesa_model.data) == 832
    assert mesa_model.data.lnT.iloc[0] == 8.660037236737706


def test_mesa_reference_geometry(mesa_model, builtin_atom_data):
    stellar = mesa_model.to_stellar_model(
        builtin_atom_data, final_atomic_number=30
    )
    r = np.asarray(stellar.geometry.r)
    assert (np.diff(r) > 0).all()
