"""End-to-end differentiability — a capability the reference (NumPy/Numba)
does not have: gradients of the emergent spectrum w.r.t. atmosphere
parameters, enabling gradient-based stellar-parameter fitting."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stardis_tpu.atom_data import build_builtin_atom_data
from stardis_tpu.plasma.lte import device_tables, solve_lte
from stardis_tpu.plasma.tables import build_plasma_tables


@pytest.fixture(scope="module")
def h_setup():
    ad = build_builtin_atom_data(max_atomic_number=2)
    tables = build_plasma_tables(ad)
    return tables, device_tables(tables)


def test_electron_density_gradient_matches_finite_difference(h_setup):
    tables, dt = h_setup
    n_elem = jnp.asarray([[1e17], [8.5e15]])

    def ne_of_t(t_scalar):
        state = solve_lte(jnp.asarray([t_scalar]), n_elem, dt)
        return state.electron_densities[0]

    t0 = 6000.0
    grad = float(jax.grad(ne_of_t)(t0))
    eps = 0.5
    fd = float((ne_of_t(t0 + eps) - ne_of_t(t0 - eps)) / (2 * eps))
    # implicit-gradient Newton step vs central finite difference
    assert np.isfinite(grad) and grad > 0  # ionization rises with T
    np.testing.assert_allclose(grad, fd, rtol=1e-4)


def test_spectrum_gradient_wrt_temperatures(h_setup, tmp_path):
    import yaml

    from stardis_tpu import parse_config_to_model
    from stardis_tpu import units as u
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.pipeline import (
        build_simulation_plan,
        stage_plasma_and_lines,
        stage_spectrum,
    )

    model_path = tmp_path / "sun.mod"
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": str(model_path),
            "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 3,
        "result_options": {},
    }
    cfg = tmp_path / "c.yml"
    cfg.write_text(yaml.safe_dump(config))
    config, adata, model = parse_config_to_model(cfg)
    lams = np.arange(6560.0, 6570.0, 0.2)
    nus = np.asarray(u.Quantity(lams, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)

    n_elem = jnp.asarray(plan.n_elem)

    def emergent_flux_sum(temps):
        state, lq = stage_plasma_and_lines(plan, temps, n_elem)
        f_nu, *_ = stage_spectrum(plan, state, lq, window=128, chunk=64)
        return jnp.sum(f_nu[-1])

    temps0 = jnp.asarray(plan.temperatures)
    grad = jax.jit(jax.grad(emergent_flux_sum))(temps0)
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    # the emergent flux must respond to photospheric temperatures
    assert np.abs(g).max() > 0
    # finite-difference check on the most sensitive depth point
    i = int(np.abs(g).argmax())
    eps = 0.5
    tp = np.asarray(temps0).copy(); tp[i] += eps
    tm = np.asarray(temps0).copy(); tm[i] -= eps
    fd = (
        float(emergent_flux_sum(jnp.asarray(tp)))
        - float(emergent_flux_sum(jnp.asarray(tm)))
    ) / (2 * eps)
    np.testing.assert_allclose(g[i], fd, rtol=5e-3)
