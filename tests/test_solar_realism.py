"""Physical realism: synthesized solar equivalent widths vs OBSERVED values.

Parity tests pin this framework against the reference's conventions; these
pin it against the Sun (Moore, Minnaert & Houtgast 1966 revised EWs).
With the REAL quickstart MARCS sun.mod, the real H- cross-section tables
and the builtin NIST/VALD-transcribed line data, LTE synthesis lands
within a few tens of percent of observation:

    Na D2  1.01 AA  (observed 0.75)      Na D1    0.77 AA  (0.56)
    Fe I 5269.5  0.52 AA  (0.48)         Mg b1 5183.6  1.42 AA  (~1.6)

The brackets assert a 0.45-2x ratio to observation — catching any
order-of-magnitude break in abundances x gf x populations x broadening x
continuum, while leaving room for LTE cores and gf transcription error.
"""

from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
yaml = pytest.importorskip("yaml")

from stardis_tpu import parse_config_to_model, units as u
from stardis_tpu.pipeline import build_simulation_plan, run_simulation

REFERENCE = Path("/root/reference")
SUN_MOD = REFERENCE / "docs/quickstart/sun.mod"
DATA = REFERENCE / "stardis/data"

pytestmark = pytest.mark.skipif(
    not SUN_MOD.exists(), reason="reference checkout not mounted"
)

# (label, window_lo, window_hi, line center AA, observed EW AA)
LINES = [
    ("Na D2", 5880.0, 5905.0, 5889.95, 0.75),
    ("Na D1", 5880.0, 5905.0, 5895.92, 0.56),
    ("Fe I 5269", 5265.0, 5274.0, 5269.54, 0.48),
    ("Mg b1 5183", 5160.0, 5190.0, 5183.60, 1.60),
]


@pytest.fixture(scope="module")
def solar_config(tmp_path_factory):
    base = tmp_path_factory.mktemp("realism")
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs",
            "fname": str(SUN_MOD),
            "final_atomic_number": 30,
        },
        "opacity": {
            "file": {
                "Hminus_bf": str(DATA / "h_minus_bf_W1979.dat"),
                "Hminus_ff": str(DATA / "h_minus_ff_B1987.dat"),
            },
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "line": {
                "disable": False,
                "broadening": [
                    "radiation", "quadratic_stark", "van_der_waals",
                ],
                "vald_linelist": {
                    "use_linelist": True,
                    "use_vald_broadening": True,
                },
            },
        },
        "no_of_thetas": 10,
        "result_options": {},
    }
    cfg = base / "c.yml"
    cfg.write_text(yaml.safe_dump(config))
    parsed, adata, model = parse_config_to_model(str(cfg))
    return parsed, adata, model


def synthesize(solar_config, lo, hi, dlam=0.02):
    config, adata, model = solar_config
    lam = np.arange(lo, hi, dlam)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    f_nu, *_ = run_simulation(plan)
    return lam, np.asarray(f_nu)[-1]


def equivalent_width(lam, flux, lam0, half_window=2.0):
    cont = np.percentile(flux, 95.0)
    sel = np.abs(lam - lam0) < half_window
    dlam = lam[1] - lam[0]
    return float(((1.0 - flux[sel] / cont) * dlam).sum())


@pytest.mark.parametrize("label,lo,hi,lam0,observed", LINES)
def test_equivalent_width_matches_sun(solar_config, label, lo, hi, lam0,
                                      observed):
    lam, flux = synthesize(solar_config, lo, hi)
    ew = equivalent_width(lam, flux, lam0)
    ratio = ew / observed
    assert 0.45 < ratio < 2.0, (
        f"{label}: EW {ew:.3f} AA vs observed {observed} (ratio {ratio:.2f})"
    )


def test_na_doublet_core_ordering(solar_config):
    """D2 carries twice D1's gf: its core must be at least as deep."""
    lam, flux = synthesize(solar_config, 5880.0, 5905.0)
    core_d2 = flux[np.abs(lam - 5889.95) < 0.3].min()
    core_d1 = flux[np.abs(lam - 5895.92) < 0.3].min()
    assert core_d2 <= core_d1


def test_fe_i_excitation_ordering(solar_config):
    """Similar gf, different lower excitation: Fe I 5269.54 (0.86 eV,
    log gf -1.32) must be much stronger than Fe I 6065.48 (2.61 eV,
    -1.53) — pins the Boltzmann factor flowing into the VALD path."""
    lam_a, flux_a = synthesize(solar_config, 5265.0, 5274.0, dlam=0.01)
    ew_a = equivalent_width(lam_a, flux_a, 5269.54, 1.5)
    lam_b, flux_b = synthesize(solar_config, 6061.0, 6070.0, dlam=0.01)
    ew_b = equivalent_width(lam_b, flux_b, 6065.48, 1.5)
    assert ew_a > 1.5 * ew_b, (ew_a, ew_b)


def test_hminus_opacity_weakens_lines(solar_config):
    """Dropping the H- continuum (the dominant solar visible opacity) must
    STRENGTHEN the lines — pins that the line/continuum competition flows
    through the formal solution the right way round."""
    config, adata, model = solar_config
    lam = np.arange(5880.0, 5905.0, 0.02)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    f_with, *_ = run_simulation(plan)
    import dataclasses

    plan_no_hminus = dataclasses.replace(plan, file_sources=[])
    f_without, *_ = run_simulation(plan_no_hminus)
    ew_with = equivalent_width(lam, np.asarray(f_with)[-1], 5889.95)
    ew_without = equivalent_width(lam, np.asarray(f_without)[-1], 5889.95)
    assert ew_without > ew_with


def test_hot_star_diagnostics(tmp_path):
    """A-star classics from the builtin list at Teff 9500 (gray LTE):
    Mg II 4481 is the strongest metal line, Si II 6347 clearly present,
    He I 5876 marginal (it strengthens only above ~10,500 K)."""
    from stardis_tpu.io.synthetic import write_marcs_file

    mp = tmp_path / "hot.mod"
    write_marcs_file(mp, teff=9500.0)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": str(mp), "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {
                "disable": False,
                "broadening": [
                    "radiation", "quadratic_stark", "van_der_waals",
                ],
                "vald_linelist": {
                    "use_linelist": True, "use_vald_broadening": True,
                },
            },
        },
        "no_of_thetas": 10,
        "result_options": {},
    }
    cfg = tmp_path / "c.yml"
    cfg.write_text(yaml.safe_dump(config))
    parsed, adata, model = parse_config_to_model(str(cfg))

    def depth(lo, hi, lam0):
        lam = np.arange(lo, hi, 0.02)
        nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
        plan = build_simulation_plan(parsed, adata, model, nus)
        f_nu, *_ = run_simulation(plan)
        flux = np.asarray(f_nu)[-1]
        cont = np.percentile(flux, 95.0)
        return 1.0 - flux[np.abs(lam - lam0) < 0.5].min() / cont

    assert depth(4475.0, 4487.0, 4481.13) > 0.2  # Mg II 4481
    assert depth(6341.0, 6353.0, 6347.11) > 0.1  # Si II 6347
    he = depth(5870.0, 5882.0, 5875.62)
    assert 0.0 < he < 0.1  # He I D3: present but weak at 9500 K
