"""Absolute molecular-chemistry parity against Korg (independent code).

The reference ships Korg.jl-computed number densities for C2, H2, O2 and
H2+ on a 56-point T = linspace(3000, 10000) K, rho = 3e-7 g/cm^3,
Asplund-2020 solar-composition model
(reference docs/creating_simple_models/flexible_plasma.ipynb +
korg_comparison_number_densities.csv, copied verbatim to
tests/data/korg_number_densities.csv — Korg OUTPUT data used as an
oracle, not reference code).  Korg is a completely independent Julia
implementation, so agreement here is an absolute external anchor for the
Saha chain, the atomic partition functions, and the molecular
equilibrium tables — the closest in-environment substitute for the
"absolute spectrum parity" run that needs the real kurucz store.

Bounds are the measured agreement (2026-08, builtin Huber & Herzberg
tables) with ~30% headroom; they document real physics differences:

* H2 within 27%: our ground-state vib-rot direct sum vs Korg's B&C2016
  U(H2) and D0 conventions.
* H2+ within 15% above 4000 K: both sides solve H + H+ <-> H2+; our
  K(T) comes from the Huber & Herzberg X 2Sg+ constants.
* O2 / C2 only order-of-magnitude above ~4500 K and far off below:
  Korg solves the COUPLED molecular network (CO locks up nearly all
  free C below ~4000 K, suppressing C2 by orders of magnitude), while
  STARDIS-style chemistry — reference plasma/molecules.py:106-127 and
  this port alike — solves each molecule independently against the
  atomic reservoirs.  The reference's own notebook comparison shows the
  same 1e4-level fractional differences for C2/O2 at low T.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.atom_data import build_builtin_atom_data
from stardis_tpu.io.abundances import create_scaled_solar_profile
from stardis_tpu.plasma import build_plasma_tables, device_tables, solve_lte
from stardis_tpu.plasma.molecules import (
    build_molecule_tables,
    molecule_number_density,
    molecule_number_density_coupled,
)

KORG_CSV = Path(__file__).parent / "data" / "korg_number_densities.csv"


@pytest.fixture(scope="module")
def korg_setup():
    """The notebook's model: T linspace(3000,10000) over 56 depth points,
    uniform rho = 3e-7 g/cm^3, Asplund 2020 scaled-solar composition."""
    ad = build_builtin_atom_data(max_atomic_number=30, include_molecules=True)
    mf = create_scaled_solar_profile(
        ad, final_atomic_number=30, composition_source="asplund_2020"
    )
    temps = np.linspace(3000.0, 10000.0, 56)
    masses = ad.atom_data.mass
    n_elem = pd.DataFrame(
        (3e-7 * mf.values / masses.loc[mf.index].values[:, None])
        * np.ones((1, temps.size)),
        index=mf.index,
    )
    tables = build_plasma_tables(ad, n_elem.index.values)
    dt = device_tables(tables)
    state = solve_lte(
        jnp.asarray(temps), jnp.asarray(n_elem.loc[tables.zs].values), dt
    )
    mt = build_molecule_tables(ad, tables, temps)
    n_mol = np.asarray(molecule_number_density(mt, state))
    korg = pd.read_csv(KORG_CSV)
    np.testing.assert_allclose(korg["T"].values, temps, rtol=1e-4)
    return temps, mt, n_mol, state, korg


def _frac(ours, korg_col):
    return np.abs(ours - korg_col) / korg_col


def test_h2_absolute_parity_with_korg(korg_setup):
    temps, mt, n_mol, _state, korg = korg_setup
    ours = n_mol[mt.names.index("H2")]
    # 16 orders of magnitude of absolute H2 density within 27% of an
    # independent code, across the full 3000-10000 K range.
    assert _frac(ours, korg["H2"].values).max() < 0.35


def test_h2_plus_absolute_parity_with_korg(korg_setup):
    temps, mt, n_mol, state, korg = korg_setup
    ours = n_mol[mt.names.index("H2+")]
    hot = temps >= 4000.0
    assert _frac(ours, korg["HHplus"].values)[hot].max() < 0.20
    # The Stancil-1994 continuum-path H2+ density (reference parity,
    # plasma/base.py:105-127) must also land within a factor ~2 of Korg
    # where H2+ matters (its 8-point K table is coarser).
    stancil = np.asarray(state.h2_plus_density)
    assert _frac(stancil, korg["HHplus"].values)[hot].max() < 1.0


def test_o2_c2_order_of_magnitude_above_lockup(korg_setup):
    temps, mt, n_mol, _state, korg = korg_setup
    hot = temps >= 4500.0
    o2 = _frac(n_mol[mt.names.index("O2")], korg["O2"].values)[hot]
    c2 = _frac(n_mol[mt.names.index("C2")], korg["C2"].values)[hot]
    assert o2.max() < 4.0  # measured 2.3
    assert c2.max() < 15.0  # measured 9.9
    # and the independent-equilibrium excess at low T must be PRESENT
    # (if C2 suddenly matched Korg at 3000 K we would be solving a
    # coupled network the reference does not have — flag it).
    cold = temps <= 3200.0
    assert (
        n_mol[mt.names.index("C2")][cold] > 50 * korg["C2"].values[cold]
    ).all()


def test_quadratic_solver_conjugate_form_no_underflow(korg_setup):
    """k >> N must give n_AA -> N^2/k instead of rounding to zero (the
    difference form lost O2 entirely at 10^4 K even in f64)."""
    temps, mt, n_mol, _state, korg = korg_setup
    o2 = n_mol[mt.names.index("O2")]
    assert (o2 > 0).all()
    assert _frac(o2[-1], korg["O2"].values[-1]) < 0.10  # measured 6.4%


def test_coupled_network_matches_korg_at_low_t(korg_setup):
    """The opt-in coupled solver (molecules_coupled) must close the
    CO-lockup gap: C2 goes from ~1e11x off Korg at 3000 K (independent
    quadratics) to within a factor 2 (frac < 1.0, measured 0.899), O2
    within ~6x (measured 4.8), H2+ within a factor 3 (measured 1.59),
    H2 unchanged at 27% — the bounds asserted below."""
    temps, mt, n_pair, state, korg = korg_setup[0], korg_setup[1], korg_setup[2], korg_setup[3], korg_setup[4]
    n_coup = np.asarray(molecule_number_density_coupled(mt, state))
    for name, col, bound in [
        ("H2", "H2", 0.35),    # measured 0.264
        ("C2", "C2", 1.0),     # measured 0.899 (vs 1.6e11 uncoupled)
        ("O2", "O2", 6.0),     # measured 4.8 (vs 266 uncoupled)
        ("H2+", "HHplus", 2.0),  # measured 1.59
    ]:
        frac = _frac(n_coup[mt.names.index(name)], korg[col].values)
        assert frac.max() < bound, (name, frac.max())


def test_coupled_network_conserves_reservoirs(korg_setup):
    """No constituent slot may be over-consumed (the independent
    quadratics over-consume carbon by ~98% at 3000 K); and a molecule
    whose constituents appear in no other molecule must reproduce the
    pairwise quadratic exactly."""
    import dataclasses

    temps, mt, n_pair, state, _korg = korg_setup
    n_coup = np.asarray(molecule_number_density_coupled(mt, state))
    res = np.asarray(state.ion_number_density)
    cons = np.zeros_like(res)
    for m in range(len(mt.names)):
        nu1 = 2 if mt.homonuclear[m] else 1
        cons[mt.ion1_slot[m]] += nu1 * n_coup[m]
        if not mt.homonuclear[m]:
            cons[mt.ion2_slot[m]] += n_coup[m]
    assert (cons <= res * (1 + 1e-9) + 1e-300).all()

    mt_co = dataclasses.replace(
        mt, included=np.array([n == "CO" for n in mt.names])
    )
    i = mt.names.index("CO")
    p = np.asarray(molecule_number_density(mt_co, state))[i]
    c = np.asarray(molecule_number_density_coupled(mt_co, state))[i]
    np.testing.assert_allclose(c[p > 0], p[p > 0], rtol=1e-6)


def test_coupled_network_differentiable_and_f32_safe(korg_setup):
    """jax.grad must flow through the fixed-point loop (division-free
    ratio form — the naive c/n_free map produced NaN cotangents where a
    reservoir is zero), and f32 must track f64 at roundoff."""
    temps, mt, n_mol, state, _korg = korg_setup

    def log_c2(t_scale):
        scaled = state._replace(
            ion_number_density=state.ion_number_density * t_scale
        )
        return jnp.log(
            molecule_number_density_coupled(mt, scaled)[
                mt.names.index("C2"), 0
            ]
        )

    g = jax.grad(log_c2)(1.0)
    assert np.isfinite(float(g))

    state32 = jax.tree.map(lambda a: a.astype(jnp.float32), state)
    n64 = np.asarray(molecule_number_density_coupled(mt, state))
    n32 = np.asarray(
        molecule_number_density_coupled(mt, state32, dtype=jnp.float32)
    )
    sel = n64 > 0
    assert np.isfinite(n32).all()
    assert np.abs(n32[sel] / n64[sel] - 1.0).max() < 2e-5


def test_molecule_density_f32_matches_f64(korg_setup):
    """f32 device path: the scale-factored discriminant must keep every
    intermediate below f32 max (k reaches ~1e22, k^2 would overflow) —
    f32-vs-f64 consistency at f32 roundoff, per the project rule."""
    temps, mt, n_mol, state, _korg = korg_setup
    state32 = jax.tree.map(lambda a: a.astype(jnp.float32), state)
    n32 = np.asarray(molecule_number_density(mt, state32, dtype=jnp.float32))
    sel = n_mol > 0
    rel = np.abs(n32[sel] / n_mol[sel] - 1.0)
    assert np.isfinite(n32).all()
    assert rel.max() < 2e-5, rel.max()


def test_coupled_network_converges_in_stiff_regime():
    """The stiffest case found (2500 K, rho 1e-5: ~98%-molecular H, CO
    consuming nearly all C AND O) must be converged at the default trip
    count — doubling the iterations must not move any density."""
    ad = build_builtin_atom_data(max_atomic_number=30, include_molecules=True)
    from stardis_tpu.io.abundances import create_scaled_solar_profile

    mf = create_scaled_solar_profile(
        ad, final_atomic_number=30, composition_source="asplund_2020"
    )
    temps = np.array([2500.0, 3000.0, 3500.0])
    masses = ad.atom_data.mass
    n_elem = pd.DataFrame(
        (1e-5 * mf.values / masses.loc[mf.index].values[:, None])
        * np.ones((1, temps.size)),
        index=mf.index,
    )
    tables = build_plasma_tables(ad, n_elem.index.values)
    state = solve_lte(
        jnp.asarray(temps),
        jnp.asarray(n_elem.loc[tables.zs].values),
        device_tables(tables),
    )
    mt = build_molecule_tables(ad, tables, temps)
    a = np.asarray(molecule_number_density_coupled(mt, state))
    b = np.asarray(molecule_number_density_coupled(mt, state, n_iter=800))
    sel = b > 1e-30
    assert np.abs(a[sel] / b[sel] - 1.0).max() < 1e-8
    # and hydrogen really is almost fully molecular here (the regime bites)
    h2 = a[mt.names.index("H2")][0]
    assert 2 * h2 / n_elem.loc[1].values[0] > 0.9


def test_coupled_network_residual_diagnostic(korg_setup):
    """The conservation-residual diagnostic (advisor round 4): ~1e-9 or
    better inside the validated envelope, and the notebook frame surface
    carries labeled depth columns without warning there."""
    import warnings

    from stardis_tpu.plasma.molecules import (
        coupled_network_residual,
        molecule_number_density_frame,
    )

    temps, mt, _n_pair, state, _korg = korg_setup
    n_m, x = molecule_number_density_coupled(mt, state, return_aux=True)
    resid = float(coupled_network_residual(mt, state, x, n_m))
    assert 0 <= resid < 1e-8, resid

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any residual warning -> failure
        frame = molecule_number_density_frame(mt, state, coupled=True)
    assert frame.columns.name == "depth_point"
    assert list(frame.columns) == list(range(n_m.shape[1]))
    np.testing.assert_allclose(frame.values, np.asarray(n_m), rtol=1e-12)

    # an unconverged sweep (1 undamped iteration in the stiff CO-lockup
    # regime) must trip the warning
    import unittest.mock as mock

    from stardis_tpu.plasma import molecules as mol

    def bad_solver(mt_, state_, return_aux=False, **kw):
        return molecule_number_density_coupled(
            mt_, state_, n_iter=1, damping=1.0, return_aux=return_aux
        )

    with mock.patch.object(
        mol, "molecule_number_density_coupled", side_effect=bad_solver
    ):
        with pytest.warns(UserWarning, match="conservation residual"):
            mol.molecule_number_density_frame(mt, state, coupled=True)
