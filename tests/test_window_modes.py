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

    # accuracy mode should move a substantial fraction of lines out of the
    # largest tier
    def biggest_tier_count(w):
        tiers = w["atomic"]
        if hasattr(tiers, "histogram"):  # BlockedTiers: count wide pairs
            return sum(n for n, width in tiers.histogram() if width >= 2048)
        return len(tiers[-1][0]) if tiers[-1][1] >= 2048 else 0

    assert biggest_tier_count(w_acc) < biggest_tier_count(w_ref)


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
