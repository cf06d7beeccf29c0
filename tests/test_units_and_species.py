import numpy as np
import pytest

from stardis_tpu import units as u
from stardis_tpu.constants import C_CGS
from stardis_tpu.util.species import (
    atomic_number2element_symbol,
    element_symbol2atomic_number,
    species_string_to_tuple,
)


def test_wavelength_frequency_roundtrip():
    lam = u.Quantity(6563.0, u.AA)
    nu = lam.to(u.Hz, u.spectral())
    assert np.isclose(nu.value, C_CGS / (6563.0e-8))
    back = nu.to(u.AA, u.spectral())
    assert np.isclose(back.value, 6563.0)


def test_unit_arithmetic():
    v = u.Quantity(1.0, u.km / u.s)
    assert np.isclose(v.cgs.value, 1e5)
    e = u.Quantity(1.0, u.eV)
    assert np.isclose(e.to(u.erg).value, 1.602176634e-12)


def test_quantity_array_ops():
    q = u.Quantity(np.arange(5.0), u.cm)
    assert len(q) == 5
    assert np.allclose((q * 2).value, np.arange(5.0) * 2)
    assert np.isclose(q.max().value, 4.0)


def test_parse_unit_strings():
    assert u.parse_unit("km/s").scale == 1e5
    assert u.parse_unit("erg/cm2/s").dims == (0, 1, -3, 0)
    assert u.parse_unit("cm/s2").dims == (1, 0, -2, 0)


@pytest.mark.parametrize(
    "string,expected",
    [
        ("H I", (1, 0)),
        ("H_I", (1, 0)),
        ("Si II", (14, 1)),
        ("he ii", (2, 1)),
        ("Fe III", (26, 2)),
    ],
)
def test_species_string_to_tuple(string, expected):
    assert species_string_to_tuple(string) == expected


def test_symbol_maps():
    assert element_symbol2atomic_number("Fe") == 26
    assert atomic_number2element_symbol(2) == "He"
