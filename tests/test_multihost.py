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


def _run_workers(tmp_path, mode):
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
                str(tmp_path), mode,
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


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    _run_workers(tmp_path, "nu")

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


@pytest.mark.slow
def test_two_process_batch_nu_mesh(tmp_path):
    """LIVE 2-D mesh across processes: batch rows over the process (DCN)
    axis, nu over each process's local devices — the make_batch_nu_mesh
    composition (parallel/distributed.py) executing for real, not just on
    a single-process virtual mesh."""
    _run_workers(tmp_path, "batchnu")

    # reassemble the (batch, nu)-sharded output from both processes
    pieces = {}
    for i in range(2):
        data = np.load(tmp_path / f"shards_{i}.npz")
        for key in data.files:
            b0, col0 = key[1:].split("_col")
            pieces[(int(b0), int(col0))] = data[key]
    assert len({b for b, _c in pieces}) == 2  # both batch rows present
    rows = []
    for b in sorted({b for b, _c in pieces}):
        cols = sorted(c for bb, c in pieces if bb == b)
        rows.append(
            np.concatenate([pieces[(b, c)] for c in cols], axis=2)
        )
    f_b = np.concatenate(rows, axis=0)  # [B, D, N]

    from stardis_tpu import parse_config_to_model, units as u
    from stardis_tpu.parallel.batch import BatchInputs, run_batch
    from stardis_tpu.pipeline import build_simulation_plan

    config, adata, model = parse_config_to_model(str(tmp_path / "c0.yml"))
    lam = np.arange(6560.0, 6570.0, 0.05)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    temps_b = np.stack([plan.temperatures * s for s in (0.97, 1.03)])
    batch = BatchInputs(
        temperatures=temps_b,
        n_elem=np.broadcast_to(
            plan.n_elem, (2,) + plan.n_elem.shape
        ).copy(),
        ray_distances=np.broadcast_to(
            plan.ray_distances, (2,) + plan.ray_distances.shape
        ).copy(),
    )
    f_ref = run_batch(plan, batch)  # single-process vmapped reference
    np.testing.assert_allclose(
        f_b[:, :, : f_ref.shape[2]], np.asarray(f_ref), rtol=1e-10, atol=0
    )


@pytest.mark.slow
def test_two_process_grid_scan(tmp_path):
    """LIVE distributed grid scan: both processes execute the collective
    chunk over a global batch mesh; only process 0 writes checkpoints into
    the shared out_dir, and the assembled library equals a single-process
    scan of the same models."""
    _run_workers(tmp_path, "grid")

    from stardis_tpu import parse_config_to_model, units as u
    from stardis_tpu.base import read_stellar_model
    from stardis_tpu.grid import load_grid, synthesize_grid
    from stardis_tpu.io.synthetic import write_marcs_file

    spectra, nus_out, _labels = load_grid(tmp_path / "scan")
    assert spectra.shape[0] == 8 and np.isfinite(spectra).all()

    # single-process reference scan on identical models
    config, adata, _m = parse_config_to_model(str(tmp_path / "c0.yml"))
    teffs = [4800.0 + 300.0 * k for k in range(8)]
    models = []
    for k, teff in enumerate(teffs):
        p = tmp_path / f"ref_{k}.mod"
        write_marcs_file(p, teff=teff)
        models.append(read_stellar_model(config, adata, p))
    lam = np.arange(6560.0, 6570.0, 0.05)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    ref_dir = tmp_path / "ref_scan"
    res = synthesize_grid(config, adata, models, nus, ref_dir, batch_size=8)
    assert res["done"]
    spec_ref, *_ = load_grid(ref_dir)
    np.testing.assert_allclose(spectra, spec_ref, rtol=1e-10, atol=0)
