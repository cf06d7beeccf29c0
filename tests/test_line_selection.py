"""Line-table preparation semantics: autoionization drops, range selection."""

import numpy as np
import pandas as pd
import pytest

jax = pytest.importorskip("jax")

from stardis_tpu.atom_data import build_builtin_atom_data
from stardis_tpu.constants import C_CGS, EV_TO_ERG
from stardis_tpu.opacities.lines import prepare_line_data
from stardis_tpu.plasma.tables import build_plasma_tables


@pytest.fixture(scope="module")
def setup():
    ad = build_builtin_atom_data(max_atomic_number=26, include_linelists=True)
    tables = build_plasma_tables(ad)
    return ad, tables


def test_vald_long_form_always_drops_autoionizing(setup):
    ad, tables = setup
    # craft two Fe I lines: one bound (E_up < chi=7.90 eV), one autoionizing
    ad = build_builtin_atom_data(max_atomic_number=26, include_linelists=True)
    ad.linelist_atoms = pd.DataFrame(
        {
            "atomic_number": [26, 26],
            "ion_charge": [0, 0],
            "wavelength": [6560.0, 6561.0],
            "log_gf": [-1.0, -1.0],
            "e_low": [2.0, 6.5],
            "e_up": [3.889, 8.389],  # second is above chi(Fe I)=7.90 eV
            "j_lo": [1.0, 1.0],
            "j_up": [2.0, 2.0],
            "rad": [8.0, 8.0],
            "stark": [-6.0, -6.0],
            "waals": [-7.5, -7.5],
        }
    )
    nu_lo = C_CGS / (6570e-8)
    nu_hi = C_CGS / (6550e-8)
    for drop_flag in (True, False):  # drop is unconditional for long form
        ld = prepare_line_data(
            ad, tables, nu_lo, nu_hi, use_vald=True,
            drop_autoionization=drop_flag,
        )
        assert ld.n_lines == 1
        assert np.isclose(ld.level_energy_upper[0] / EV_TO_ERG, 3.889)


def test_tardis_path_conditional_drop():
    """A genuinely autoionizing TARDIS-path line is dropped iff requested."""
    from stardis_tpu.atom_data import build_builtin_atom_data
    from stardis_tpu.plasma.tables import build_plasma_tables

    ad = build_builtin_atom_data(max_atomic_number=2)
    # fabricate an H I level above the ionization energy and a line into it
    import pandas as pd

    auto_level = pd.DataFrame(
        {"energy": [14.5 * EV_TO_ERG], "g": [2.0], "metastable": [False]},
        index=pd.MultiIndex.from_tuples(
            [(1, 0, 50)], names=["atomic_number", "ion_number", "level_number"]
        ),
    )
    ad.levels = pd.concat([ad.levels, auto_level])
    nu_line = 4.6e14
    fake_line = ad.lines.iloc[[0]].copy()
    fake_line.loc[:, ["level_number_lower", "level_number_upper", "nu"]] = [
        [1, 50, nu_line]
    ]
    ad.lines = pd.concat([ad.lines, fake_line], ignore_index=True)
    tables = build_plasma_tables(ad)

    nu_lo, nu_hi = 4.0e14, 5.0e14
    ld_drop = prepare_line_data(ad, tables, nu_lo, nu_hi, use_vald=False,
                                drop_autoionization=True)
    ld_keep = prepare_line_data(ad, tables, nu_lo, nu_hi, use_vald=False,
                                drop_autoionization=False)
    assert ld_keep.n_lines == ld_drop.n_lines + 1
    assert (ld_drop.level_energy_upper <= ld_drop.ionization_energy).all()
    assert (ld_keep.level_energy_upper > ld_keep.ionization_energy).any()


def test_range_selection_sorted(setup):
    ad, tables = setup
    nu_lo, nu_hi = 4.0e14, 5.0e14
    ld = prepare_line_data(ad, tables, nu_lo, nu_hi)
    assert (ld.nu >= nu_lo).all() and (ld.nu <= nu_hi).all()
    assert (np.diff(ld.nu) >= 0).all()  # ascending
