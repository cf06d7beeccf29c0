"""parallel/distributed.py mesh factories + initialize gating (the logic
that runs fine single-process; live multi-host needs real hardware)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from stardis_tpu.parallel import distributed


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed.initialize() is False


def test_initialize_respects_env_single(monkeypatch):
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert distributed.initialize() is False


def test_make_global_mesh_covers_all_devices():
    mesh = distributed.make_global_mesh()
    assert mesh.axis_names == ("nu",)
    assert mesh.shape["nu"] == len(jax.devices())


def test_make_batch_nu_mesh_shapes():
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = distributed.make_batch_nu_mesh(n_batch=2)
    assert mesh.axis_names == ("batch", "nu")
    assert mesh.shape["batch"] == 2
    assert mesh.shape["nu"] == n_dev // 2
    # default single-host: one batch row
    mesh1 = distributed.make_batch_nu_mesh()
    assert mesh1.shape["batch"] == 1
    assert mesh1.shape["nu"] == n_dev


def test_make_batch_nu_mesh_divisibility_error():
    n_dev = len(jax.devices())
    if n_dev % 3 == 0:
        pytest.skip("device count divisible by 3")
    with pytest.raises(ValueError, match="not divisible"):
        distributed.make_batch_nu_mesh(n_batch=3)


def test_batch_nu_mesh_runs_batch(builtin_atom_data, synthetic_sun_path):
    """A 2x4 (batch x nu) mesh actually executes run_batch over its batch
    axis (exercises make_batch_nu_mesh's reshape end to end)."""
    import yaml

    from stardis_tpu import parse_config_to_model, units as u
    from stardis_tpu.parallel.batch import make_batch, run_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import tempfile, os

    cfg = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:2",
        "input_model": {
            "type": "marcs",
            "fname": str(synthetic_sun_path),
            "final_atomic_number": 2,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 3,
        "result_options": {},
    }
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "c.yml")
    with open(path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    config, adata, model = parse_config_to_model(path)
    lambdas = np.arange(6560.0, 6566.0, 0.1)
    nus = np.asarray(u.Quantity(lambdas, u.AA).to(u.Hz, u.spectral()))
    plan, batch = make_batch(config, adata, [model, model], nus)
    mesh = distributed.make_batch_nu_mesh(n_batch=2)
    # run_batch shards over 'batch'; the nu axis of this mesh is unused by
    # it (the batch path is embarrassingly parallel) but must not break
    from jax.sharding import Mesh

    batch_mesh = Mesh(np.asarray(mesh.devices).reshape(-1)[:2], ("batch",))
    f_nu = run_batch(plan, batch, mesh=batch_mesh)
    assert f_nu.shape[0] == 2
    np.testing.assert_allclose(
        np.asarray(f_nu[0]), np.asarray(f_nu[1]), rtol=1e-12
    )
