import numpy as np
import pandas as pd
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.atom_data import build_builtin_atom_data
from stardis_tpu.constants import EV_TO_ERG, K_B_CGS
from stardis_tpu.plasma.lte import device_tables, solve_lte
from stardis_tpu.plasma.molecules import (
    build_molecule_tables,
    compute_molecule_line_quantities,
    molecule_number_density,
    parse_molecular_ion,
    prepare_molecule_line_data,
)
from stardis_tpu.plasma.tables import build_plasma_tables
from stardis_tpu.opacities.lines import compute_line_quantities, prepare_line_data


@pytest.fixture(scope="module")
def mol_setup():
    ad = build_builtin_atom_data(
        max_atomic_number=8, include_linelists=True, include_molecules=True
    )
    tables = build_plasma_tables(ad)
    dt = device_tables(tables)
    temps = np.array([3000.0, 4000.0, 5000.0, 6000.0])
    n_h = np.full(4, 1e17)
    n_elem = np.zeros((tables.n_elements, 4))
    for i, z in enumerate(tables.zs):
        scale = {1: 1.0, 2: 0.085, 6: 2.7e-4, 8: 4.9e-4}.get(int(z), 1e-6)
        n_elem[i] = n_h * scale
    state = solve_lte(jnp.asarray(temps), jnp.asarray(n_elem), dt)
    return ad, tables, temps, state


def test_parse_molecular_ion():
    assert parse_molecular_ion("H") == (1, 0)
    assert parse_molecular_ion("H+") == (1, 1)
    assert parse_molecular_ion("C") == (6, 0)
    assert parse_molecular_ion("O-") == (8, -1)


def test_molecule_number_density_physical(mol_setup):
    ad, tables, temps, state = mol_setup
    mt = build_molecule_tables(ad, tables, temps)
    n_mol = np.asarray(molecule_number_density(mt, state))
    assert n_mol.shape == (mt.n_molecules, 4)
    assert mt.n_molecules >= 5  # H2, CO, CH, OH, MgH
    assert (n_mol >= 0).all()
    i_h2 = mt.index_of("H2")
    # H2 fraction decreases with temperature (dissociation)
    assert n_mol[i_h2, 0] > n_mol[i_h2, -1]
    # at 3000 K some H2 forms but far less than n_H
    assert 0 < n_mol[i_h2, 0] < 1e17


def test_molecule_mass_conservation_limit(mol_setup):
    """Homonuclear closed form: verify n_A^2 = K n_AA holds."""
    ad, tables, temps, state = mol_setup
    mt = build_molecule_tables(ad, tables, temps)
    n_mol = np.asarray(molecule_number_density(mt, state))
    i_h2 = mt.index_of("H2")
    n_tot = np.asarray(state.ion_number_density)[0]  # free H I given
    # the solver's constraint: with N = free + 2*mol, n_free^2 = K n_mol
    k = mt.k_density[i_h2]
    n_free = n_tot - 2 * n_mol[i_h2]
    lhs = n_free**2
    rhs = k * n_mol[i_h2]
    mask = n_mol[i_h2] > 1e-20
    np.testing.assert_allclose(lhs[mask], rhs[mask], rtol=1e-6)


def test_molecular_lines_quantities(mol_setup):
    ad, tables, temps, state = mol_setup
    mt = build_molecule_tables(ad, tables, temps)
    # fabricate a few CO lines in a window (plumbing test)
    ad.linelist_molecules = pd.DataFrame(
        {
            "molecule": ["CO", "CO", "H2"],
            "wavelength": [6550.0, 6570.0, 6560.0],
            "log_gf": [-2.0, -2.5, -3.0],
            "e_low": [0.1, 0.2, 0.5],
            "e_up": [1.99, 2.08, 2.38],
            "j_lo": [10, 11, 2],
            "j_up": [11, 12, 3],
            "rad": [7.0, 7.0, 7.0],
            "stark": [0.0, 0.0, 0.0],
            "waals": [0.0, 0.0, 0.0],
        }
    )
    nu_min, nu_max = 4.5e14, 4.6e14
    mld = prepare_molecule_line_data(ad, mt, nu_min, nu_max)
    assert mld.n_lines == 3
    alpha, gamma, doppler = compute_molecule_line_quantities(
        mld, mt, state, jnp.asarray(temps), 1e5, ("radiation",)
    )
    assert np.isfinite(np.asarray(alpha)).all()
    assert (np.asarray(alpha) >= 0).all()
    # radiation-only gamma = A_ul
    np.testing.assert_allclose(np.asarray(gamma), 1e7, rtol=1e-6)
    # CO doppler width smaller than H2's (heavier molecule), comparing lines
    # at nearly equal frequency
    d = np.asarray(doppler)
    assert d[0, 0] < d[2, 0]


def test_vald_path_matches_tardis_path(mol_setup):
    """The VALD linelist built from the same hydrogen lines must produce the
    same alpha as the TARDIS-path calculation (the physics is identical:
    gf/U cancellation)."""
    ad, tables, temps, state = mol_setup
    # window holding H-alpha only: the builtin VALD list also carries
    # transcribed He/metal lines (e.g. He I 6678 at 4.49e14 Hz) that have
    # no counterpart in the TARDIS-path `lines` table
    nu_min, nu_max = 4.52e14, 4.62e14

    ld_tardis = prepare_line_data(ad, tables, nu_min, nu_max, use_vald=False)
    ld_vald = prepare_line_data(ad, tables, nu_min, nu_max, use_vald=True)
    assert ld_vald.n_lines == ld_tardis.n_lines > 0

    t = jnp.asarray(temps)
    a1, g1, d1 = compute_line_quantities(
        ld_tardis, state, t, 1e5, ("radiation",)
    )
    a2, g2, d2 = compute_line_quantities(
        ld_vald, state, t, 1e5, ("radiation",)
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-10)


def test_vald_broadening_flag(mol_setup):
    ad, tables, temps, state = mol_setup
    ld = prepare_line_data(ad, tables, 4.4e14, 4.8e14, use_vald=True)
    t = jnp.asarray(temps)
    flags = ("radiation", "linear_stark", "quadratic_stark", "van_der_waals")
    _, g_vald, _ = compute_line_quantities(
        ld, state, t, 1e5, flags, use_vald_broadening=True
    )
    _, g_std, _ = compute_line_quantities(
        ld, state, t, 1e5, flags, use_vald_broadening=False
    )
    g_vald, g_std = np.asarray(g_vald), np.asarray(g_std)
    assert np.isfinite(g_vald).all() and (g_vald > 0).all()
    # builtin linelist has stark=waals=0 (missing), so VALD gamma is
    # (A_ul + linear_stark)/2 — different from the computed-broadening path
    assert not np.allclose(g_vald, g_std)


def test_molecular_vdw_divergence_quantified(mol_setup):
    """Decision test for the documented molecular-vdW divergence.

    The reference routes molecular lines with packed vdW in (0, 20)
    through the Unsoeld enhancement (broadening.py:735-821 -> 994-1001),
    whose n_eff needs an atomic ionization energy the molecular linelist
    does not have — it cannot produce a physical value for molecules (the
    reference also never applies its 'HWHM TO FWHM' halving there: line
    798 is a bare no-op expression).  stardis_tpu applies the scaled
    10^vdW law for negative packed values and deliberately contributes
    ZERO for values in (0, 20).

    This pins that decision: (a) (0,20)-packed vdW behaves exactly like
    vdW=0 (the divergence is a no-op relative to disabled vdW, not silent
    garbage), and (b) the delta that WOULD come from real vdW broadening
    (the negative-packed scaled law) is nonzero and bounded, quantifying
    the largest effect the skipped branch could have had.
    """
    ad, tables, temps, state = mol_setup
    from stardis_tpu.plasma.molecules import build_molecule_tables

    mt = build_molecule_tables(ad, tables, temps)

    def quants(waals_value):
        ad.linelist_molecules = pd.DataFrame(
            {
                "molecule": ["CO"] * 3,
                "wavelength": [6550.0, 6560.0, 6570.0],
                "log_gf": [-3.0, -2.5, -3.5],
                "e_low": [0.1, 0.3, 0.6],
                "j_lo": [10.0, 12.0, 8.0],
                "j_up": [11.0, 13.0, 9.0],
                "rad": [6.5, 6.5, 6.5],
                "stark": [0.0, 0.0, 0.0],
                "waals": [waals_value] * 3,
            }
        )
        from stardis_tpu.constants import C_CGS

        mld = prepare_molecule_line_data(
            ad, mt, C_CGS / 6600e-8, C_CGS / 6500e-8
        )
        return compute_molecule_line_quantities(
            mld, mt, state, jnp.asarray(temps), 1e5,
            ("radiation", "van_der_waals"),
        )

    _, g_zero, _ = quants(0.0)
    _, g_unsoeld_range, _ = quants(7.5)  # packed (0, 20): Unsoeld in ref
    _, g_scaled, d_scaled = quants(-7.3)  # negative: scaled law

    # (a) the skipped Unsoeld branch contributes exactly nothing
    np.testing.assert_array_equal(
        np.asarray(g_unsoeld_range), np.asarray(g_zero)
    )
    # (b) the scaled law DOES contribute, and dominates radiation at the
    # cool dense depths — bounding what a vdW treatment can change
    extra = np.asarray(g_scaled) - np.asarray(g_zero)
    assert extra.min() > 0
    rel_width = extra / np.asarray(d_scaled)
    assert rel_width.max() > 1e-4  # vdW is a measurable fraction of Doppler
    assert np.isfinite(rel_width).all()


def test_molecules_coupled_end_to_end_cool_star(tmp_path):
    """Full pipeline on a cool (Teff 4000) atmosphere with a molecular
    VALD line, pairwise vs coupled: both finite/positive, and the
    coupled network must change the molecular line (shared-reservoir
    depletion weakens MgH where H2/CO compete for constituents)."""
    import yaml

    from stardis_tpu.base import parse_config_to_model
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.pipeline import build_simulation_plan, run_simulation
    from stardis_tpu import units as u

    mp = tmp_path / "cool.mod"
    write_marcs_file(mp, teff=4000.0)
    base_cfg = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": str(mp), "final_atomic_number": 30,
        },
        "opacity": {
            "line": {
                "disable": False,
                "broadening": ["radiation"],
                "include_molecules": True,
                "vald_linelist": {"use_linelist": True},
            },
        },
        "no_of_thetas": 2,
        "result_options": {},
    }
    nus = np.atleast_1d(np.asarray(
        u.Quantity(np.arange(5160.0, 5170.0, 0.05), u.AA).to(
            u.Hz, u.spectral()
        )
    ))
    mgh = pd.DataFrame({
        "molecule": ["MgH"], "wavelength": [5165.0], "log_gf": [0.5],
        "e_low": [0.0], "e_up": [2.4], "j_lo": [5], "j_up": [6],
        "rad": [7.5], "stark": [0.0], "waals": [0.0],
    })
    spectra = {}
    for coupled in (False, True):
        cfg = dict(base_cfg)
        cfg["opacity"] = yaml.safe_load(yaml.safe_dump(base_cfg["opacity"]))
        cfg["opacity"]["line"]["molecules_coupled"] = coupled
        cp = tmp_path / f"c_{coupled}.yml"
        cp.write_text(yaml.safe_dump(cfg))
        config, adata, model = parse_config_to_model(cp)
        adata.linelist_molecules = mgh.copy()
        plan = build_simulation_plan(config, adata, model, nus)
        assert plan.molecules_coupled is coupled
        f_nu, _tot, _od, _i, _state, _w = run_simulation(plan)
        f = np.asarray(f_nu)[-1]
        assert np.isfinite(f).all() and (f > 0).all()
        spectra[coupled] = f
    rel = np.abs(spectra[True] / spectra[False] - 1.0)
    assert rel.max() > 1e-6, "coupled network must alter the MgH line"
