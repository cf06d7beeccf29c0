import numpy as np
import pytest

from stardis_tpu.native import read_vald_linelist, _read_python

VALD_LONG_SAMPLE = """\
                                                                   Lande factors      Damping parameters
Elm Ion      WL_air(A)   log gf* E_low(eV) J lo  E_up(eV) J up  lower  upper   mean   Rad.  Stark  Waals
'Fe 1',      6494.9804,  -1.273,  2.4040, 1.0,  4.3123, 2.0,  0.805,  1.316,  1.110, 8.200, -6.160, -7.790,
'Ca 1',      6493.7810,  -0.109,  2.5213, 2.0,  4.4300, 3.0,  1.100,  1.200,  1.150, 7.800, -5.900, -7.500,
'Si 2',      6500.1000,   0.250,  8.1210, 0.5, 10.0280, 1.5,  0.000,  1.330,  0.660, 8.500, -5.200, -7.200,
'XX 1',      6500.0000,   0.000,  0.0000, 0.0,  1.0000, 1.0,  0.0,    0.0,    0.0,   0.0,   0.0,    0.0,
 References: 1. Kurucz
"""

VALD_SHORT_SAMPLE = """\
Elm Ion       WL_air(A)  Excit(eV) log gf* Rad.   Stark   Waals
'Fe 1',       6494.9804,  2.4040, -1.273, 8.200, -6.160, -7.790,
'Ca 1',       6493.7810,  2.5213, -0.109, 7.800, -5.900, -7.500,
 References
"""


@pytest.fixture
def long_file(tmp_path):
    p = tmp_path / "vald_long.txt"
    p.write_text(VALD_LONG_SAMPLE)
    return p


@pytest.fixture
def short_file(tmp_path):
    p = tmp_path / "vald_short.txt"
    p.write_text(VALD_SHORT_SAMPLE)
    return p


def test_parse_long_format(long_file):
    frame, is_short = read_vald_linelist(long_file)
    assert not is_short
    assert len(frame) == 3  # 'XX 1' skipped (unknown species)
    fe = frame.iloc[0]
    assert fe.atomic_number == 26 and fe.ion_charge == 0
    assert np.isclose(fe.wavelength, 6494.9804)
    assert np.isclose(fe.log_gf, -1.273)
    assert np.isclose(fe.e_low, 2.4040)
    assert np.isclose(fe.j_lo, 1.0) and np.isclose(fe.j_up, 2.0)
    assert np.isclose(fe.rad, 8.2)
    assert np.isclose(fe.stark, -6.16)
    assert np.isclose(fe.waals, -7.79)
    si = frame.iloc[2]
    assert si.atomic_number == 14 and si.ion_charge == 1


def test_parse_short_format(short_file):
    frame, is_short = read_vald_linelist(short_file)
    assert is_short
    assert len(frame) == 2
    assert "j_lo" not in frame.columns
    assert np.isclose(frame.iloc[0].e_low, 2.4040)
    assert np.isclose(frame.iloc[0].log_gf, -1.273)


def test_native_matches_python_fallback(long_file):
    native, s1 = read_vald_linelist(long_file, use_native=True)
    fallback, s2 = _read_python(str(long_file))
    assert s1 == s2
    for col in native.columns:
        np.testing.assert_allclose(
            native[col].values.astype(float),
            fallback[col].values.astype(float),
        )


def test_native_speed_on_large_file(tmp_path):
    """The native parser must beat the Python fallback on a bulk file."""
    import time

    line = "'Fe 1',      6494.9804,  -1.273,  2.4040, 1.0,  4.3123, 2.0,  0.805,  1.316,  1.110, 8.200, -6.160, -7.790,\n"
    p = tmp_path / "big.txt"
    p.write_text("header\n" + line * 50000)
    t0 = time.perf_counter()
    frame, _ = read_vald_linelist(p, use_native=True)
    t_native = time.perf_counter() - t0
    assert len(frame) == 50000
    t0 = time.perf_counter()
    frame2, _ = _read_python(str(p))
    t_python = time.perf_counter() - t0
    assert len(frame2) == 50000
    assert t_native < t_python  # typically 30-100x
