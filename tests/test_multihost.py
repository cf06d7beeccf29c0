"""LIVE multi-process bring-up: two jax.distributed processes (4 virtual
CPU devices each) run the sharded spectrum over the GLOBAL 8-device mesh;
the reassembled output must equal the single-process result.

This is the closest a single-machine environment gets to a real multi-host
TPU run: jax.distributed.initialize, a cross-process global mesh, and the
collective-free nu partition all execute for real (the reference has no
distributed backend at all, SURVEY.md §2.10)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")

WORKER = Path(__file__).parent / "multihost_worker.py"


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    import socket

    # find a free localhost port for the coordinator
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("cannot bind localhost sockets in this sandbox")
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(WORKER), coordinator, "2", str(i),
                str(tmp_path),
            ],
            env=env,
            cwd=str(Path(__file__).parent.parent),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    # reassemble the nu-sharded output from both processes' shards
    shards = {}
    for i in range(2):
        data = np.load(tmp_path / f"shards_{i}.npz")
        for key in data.files:
            shards[int(key[3:])] = data[key]
    assert len(shards) >= 2  # both processes held shards
    f_nu = np.concatenate(
        [shards[k] for k in sorted(shards)], axis=1
    )

    # single-process reference on the identical inputs
    import yaml

    from stardis_tpu import parse_config_to_model, units as u
    from stardis_tpu.pipeline import build_simulation_plan, run_simulation

    config, adata, model = parse_config_to_model(
        str(tmp_path / "c0.yml")
    )
    lam = np.arange(6560.0, 6570.0, 0.05)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    f_ref, *_ = run_simulation(plan)
    np.testing.assert_allclose(
        f_nu[:, : f_ref.shape[1]], np.asarray(f_ref), rtol=1e-10, atol=0
    )
