"""Deep golden regression of the plasma surface.

The reference pins ~26 named TARDIS plasma properties per run
(reference tests/test_stardis_regression.py:4-31).  This is the equivalent
pin set for the TPU pipeline: every solver output (Saha phi, partition
functions, Boltzmann factors, ion/level/electron densities, H-/H2/H2+,
line alpha/gamma/doppler triples) plus the static tables that feed them,
on the deterministic synthetic-sun + builtin-data config.

Regenerate after intentional physics changes:
  python -m pytest tests/test_golden_plasma.py --generate-reference
"""

from pathlib import Path

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu import parse_config_to_model
from stardis_tpu import units as u
from stardis_tpu.util.regression import RegressionData

GOLDEN_DIR = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.pipeline import (
        build_simulation_plan,
        run_simulation,
    )

    base = tmp_path_factory.mktemp("golden_plasma")
    model_path = base / "sun.mod"
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:30",
        "input_model": {
            "type": "marcs",
            "fname": str(model_path),
            "final_atomic_number": 30,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "disable_electron_scattering": False,
            "line": {
                "disable": False,
                "broadening": [
                    "radiation",
                    "linear_stark",
                    "quadratic_stark",
                    "van_der_waals",
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
    config, adata, model = parse_config_to_model(str(cfg))
    lams = np.arange(5885.0, 5900.0, 0.1)  # Na D window: metal-line forest
    nus = np.asarray(u.Quantity(lams, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    f_nu, total, opacities, i_nus, state, window = run_simulation(plan)
    return plan, state, f_nu, total, opacities


def test_golden_plasma_surface(pipeline_run, request):
    from stardis_tpu.plasma.lte import (
        device_tables,
        level_boltzmann_factor,
        saha_phi,
    )

    plan, state, f_nu, total, opacities = pipeline_run
    generate = request.config.getoption("--generate-reference")
    rd = RegressionData(
        GOLDEN_DIR, "solar_nad_plasma", generate=generate, rtol=1e-6
    )
    dt = plan.dtables

    # --- static tables (parity: levels/lines/ionization_data/g/...) ----
    rd.sync_ndarray("zs", plan.tables.zs)
    rd.sync_ndarray("chi", plan.tables.chi)
    rd.sync_ndarray("level_energy", plan.tables.level_energy)
    rd.sync_ndarray("level_g", plan.tables.level_g)
    rd.sync_ndarray("metastability", plan.tables.level_meta)
    rd.sync_ndarray("line_nu", plan.line_data.nu)

    # --- solver outputs (parity: beta_rad, g_electron, phi, U, n_e, ...) -
    rd.sync_ndarray("t_electrons", np.asarray(state.t))
    rd.sync_ndarray("beta_rad", np.asarray(state.beta))
    rd.sync_ndarray("g_electron", np.exp(np.asarray(state.log_g_electron)))
    rd.sync_ndarray(
        "partition_function", np.asarray(state.partition_function)
    )
    rd.sync_ndarray("phi", np.asarray(saha_phi(state, dt)))
    rd.sync_ndarray(
        "level_boltzmann_factor",
        np.asarray(level_boltzmann_factor(state, dt)),
    )
    rd.sync_ndarray(
        "electron_densities", np.asarray(state.electron_densities)
    )
    rd.sync_ndarray(
        "ion_number_density", np.asarray(state.ion_number_density)
    )
    rd.sync_ndarray(
        "level_number_density", np.asarray(state.level_number_density)
    )
    rd.sync_ndarray("number_density", np.asarray(state.number_density))
    rd.sync_ndarray("h_minus_density", np.asarray(state.h_minus_density))
    rd.sync_ndarray("h2_density", np.asarray(state.h2_density))
    rd.sync_ndarray("h2_plus_density", np.asarray(state.h2_plus_density))

    # --- line quantities (parity: alpha_line + broadening diagnostics) --
    rd.sync_ndarray(
        "alpha_line_gammas",
        np.asarray(opacities["alpha_line_at_nu_gammas"]),
    )
    rd.sync_ndarray(
        "alpha_line_doppler",
        np.asarray(opacities["alpha_line_at_nu_doppler_widths"]),
    )
    rd.sync_ndarray(
        "alpha_line_at_nu", np.asarray(opacities["alpha_line_at_nu"])
    )

    # --- opacity grid + radiation field ---------------------------------
    for key in ("alpha_bf", "alpha_ff", "alpha_rayleigh", "alpha_electron"):
        rd.sync_ndarray(key, np.asarray(opacities[key]))
    rd.sync_ndarray("total_alphas", np.asarray(total))
    rd.sync_ndarray("F_nu", np.asarray(f_nu))
    rd.flush()


def test_lte_identities(pipeline_run):
    """Physics invariants, independent of the golden store: Saha identity
    and level-sum == ion density."""
    from stardis_tpu.plasma.lte import saha_phi

    plan, state, *_ = pipeline_run
    dt = plan.dtables
    tb = plan.tables
    phi = np.asarray(saha_phi(state, dt))
    n_ion = np.asarray(state.ion_number_density)
    n_e = np.asarray(state.electron_densities)
    e_h = int(np.searchsorted(tb.zs, 1))
    s0, s1 = tb.slot_of(1, 0), tb.slot_of(1, 1)
    np.testing.assert_allclose(
        n_ion[s1] * n_e / n_ion[s0], phi[e_h, 0], rtol=1e-6
    )
    # level populations of an ion sum to the ion density
    n_level = np.asarray(state.level_number_density)
    sel = tb.level_slot == s0
    np.testing.assert_allclose(n_level[sel].sum(0), n_ion[s0], rtol=1e-6)
