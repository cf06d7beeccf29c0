"""Worker for the live multi-process test (tests/test_multihost.py).

Each process initializes jax.distributed against a localhost coordinator,
builds the identical simulation, runs the sharded spectrum over the GLOBAL
mesh (devices from both processes), and saves its addressable output
shards for the parent test to reassemble.

Usage: python multihost_worker.py <coordinator> <n_proc> <proc_id> <outdir>
       [mode]

mode "nu" (default): 1-D wavelength sharding over the global mesh.
mode "batchnu": the 2-D batch x nu mesh from distributed.make_batch_nu_mesh
(batch rows across processes — the DCN axis on real pods — nu within each
process's devices), exercising run_batch's sharded stage live.
mode "grid": a checkpointed grid scan (stardis_tpu.grid) over a GLOBAL
batch mesh — every process executes the collective chunk, only process 0
writes checkpoints into the shared outdir.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    coordinator, n_proc, proc_id, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "nu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from stardis_tpu.parallel import distributed

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.process_count() == n_proc
    assert jax.device_count() == 4 * n_proc

    import numpy as np
    import jax.numpy as jnp
    import yaml

    from stardis_tpu import parse_config_to_model, units as u
    from stardis_tpu.io.synthetic import write_marcs_file
    from stardis_tpu.parallel.sharding import shard_spectrum
    from stardis_tpu.pipeline import (
        build_simulation_plan,
        line_window_tiers,
        stage_plasma_and_lines,
    )

    # identical inputs on every process (SPMD): write_marcs_file is
    # deterministic, so each process writes its OWN copy (no cross-process
    # file race)
    model_path = os.path.join(outdir, f"sun_{proc_id}.mod")
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:5",
        "input_model": {
            "type": "marcs", "fname": model_path, "final_atomic_number": 5,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "line": {"disable": False, "broadening": ["radiation"]},
        },
        "no_of_thetas": 3,
        "result_options": {},
    }
    cfg_path = os.path.join(outdir, f"c{proc_id}.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(config, fh)
    config, adata, model = parse_config_to_model(cfg_path)
    lam = np.arange(6560.0, 6570.0, 0.05)
    nus = np.asarray(u.Quantity(lam, u.AA).to(u.Hz, u.spectral()))
    if mode == "grid":
        # checkpointed library scan over a GLOBAL batch mesh: one chunk of
        # 8 models, one model per device, both processes in the collective
        from jax.sharding import Mesh
        from stardis_tpu.base import read_stellar_model
        from stardis_tpu.grid import synthesize_grid

        teffs = [4800.0 + 300.0 * k for k in range(8)]
        models = []
        for k, teff in enumerate(teffs):
            p = os.path.join(outdir, f"grid_{proc_id}_{k}.mod")
            write_marcs_file(p, teff=teff)
            models.append(read_stellar_model(config, adata, p))
        mesh = Mesh(np.asarray(jax.devices()), ("batch",))
        res = synthesize_grid(
            config, adata, models, nus, os.path.join(outdir, "scan"),
            batch_size=8, mesh=mesh,
        )
        assert res["done"], res
        print(f"proc {proc_id}: grid scan {res}", flush=True)
        return

    plan = build_simulation_plan(config, adata, model, nus)

    if mode == "batchnu":
        # 2-D mesh live: batch rows across the two processes (the DCN axis
        # on a real pod), nu over each process's local devices
        from stardis_tpu.parallel.batch import BatchInputs, run_batch

        temps_b = np.stack(
            [plan.temperatures * s for s in (0.97, 1.03)]
        )
        batch = BatchInputs(
            temperatures=temps_b,
            n_elem=np.broadcast_to(
                plan.n_elem, (2,) + plan.n_elem.shape
            ).copy(),
            ray_distances=np.broadcast_to(
                plan.ray_distances, (2,) + plan.ray_distances.shape
            ).copy(),
        )
        mesh = distributed.make_batch_nu_mesh(2)
        f_b = run_batch(plan, batch, mesh=mesh)
        shards = {}
        for shard in f_b.addressable_shards:
            b0 = shard.index[0].start or 0
            col0 = shard.index[2].start or 0
            shards[f"b{b0}_col{col0}"] = np.asarray(shard.data)
        np.savez(os.path.join(outdir, f"shards_{proc_id}.npz"), **shards)
        print(f"proc {proc_id}: wrote {len(shards)} 2-D shards", flush=True)
        return

    state, lq = jax.jit(lambda t, n: stage_plasma_and_lines(plan, t, n))(
        jnp.asarray(plan.temperatures), jnp.asarray(plan.n_elem)
    )
    window = line_window_tiers(plan, lq, state)
    mesh = distributed.make_global_mesh()  # all 8 devices, both processes
    f_nu = shard_spectrum(plan, state, lq, window, mesh)

    # save this process's addressable shards
    shards = {}
    for shard in f_nu.addressable_shards:
        col0 = shard.index[1].start or 0
        shards[f"col{col0}"] = np.asarray(shard.data)
    np.savez(os.path.join(outdir, f"shards_{proc_id}.npz"), **shards)
    print(f"proc {proc_id}: wrote {len(shards)} shards", flush=True)


if __name__ == "__main__":
    main()
