import numpy as np

from stardis_tpu.atom_data import AtomData, build_builtin_atom_data
from stardis_tpu.atom_data.builtin import hydrogen_f_lu
from stardis_tpu.constants import EV_TO_ERG


def test_hydrogen_oscillator_strengths():
    # canonical values: Lyman-alpha 0.4162, H-alpha 0.6407 (e.g. Wiese 2009)
    assert np.isclose(hydrogen_f_lu(1, 2), 0.4162, atol=2e-4)
    assert np.isclose(hydrogen_f_lu(2, 3), 0.6407, atol=2e-4)
    assert np.isclose(hydrogen_f_lu(1, 3), 0.0791, atol=2e-3)


def test_builtin_levels_and_lines(builtin_atom_data):
    ad = builtin_atom_data
    # H ionization energy
    chi_h = ad.ionization_data.loc[(1, 1)]
    assert np.isclose(chi_h / EV_TO_ERG, 13.598434, rtol=1e-6)
    # ground level of H I
    assert ad.levels.loc[(1, 0, 0)].g == 2
    assert ad.levels.loc[(1, 0, 0)].energy == 0.0
    # H-alpha line present near 6564.6 AA (vacuum)
    waves_aa = ad.lines.wavelength_cm.values * 1e8
    assert np.any(np.abs(waves_aa - 6564.6) < 1.0)
    # A_ul of H-alpha ~ 4.41e7 1/s  (sum over fine structure ~ 4.41e7)
    halpha = ad.lines[
        (ad.lines.level_number_lower == 1) & (ad.lines.level_number_upper == 2)
    ].iloc[0]
    assert np.isclose(halpha.A_ul, 4.41e7, rtol=0.02)


def test_prepare_atom_data_restricts(builtin_atom_data):
    ad = build_builtin_atom_data(max_atomic_number=30)
    ad.prepare_atom_data(np.arange(1, 6))
    assert ad.atom_data.index.max() == 5
    assert ad.levels.index.get_level_values("atomic_number").max() == 5


def test_hdf_roundtrip(tmp_path, builtin_atom_data):
    path = tmp_path / "atoms.h5"
    builtin_atom_data.to_hdf(path)
    loaded = AtomData.from_hdf(path)
    assert np.allclose(
        loaded.ionization_data.values, builtin_atom_data.ionization_data.values
    )
    assert np.allclose(loaded.lines.nu.values, builtin_atom_data.lines.nu.values)
    assert len(loaded.levels) == len(builtin_atom_data.levels)
