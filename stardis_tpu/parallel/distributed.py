"""Multi-host bring-up helpers.

The reference has no distributed backend at all (SURVEY.md §2.10); the
TPU-native scaling story is `jax.distributed.initialize` + a (hosts x local
devices) mesh with the wavelength axis riding ICI within a slice and DCN
across slices.  This module provides the initialization wrapper and mesh
factories; the hot paths (parallel/sharding.py, parallel/batch.py) are
topology-agnostic — they only see mesh axis names.

Single-host (or this environment's single-chip) calls are no-ops, so the
same program runs unmodified from 1 chip to a pod slice:

    from stardis_tpu.parallel import distributed
    distributed.initialize()               # no-op if single process
    mesh = distributed.make_global_mesh()  # ('nu',) over all devices
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed when running multi-process.

    With no arguments, auto-detects from the standard environment variables
    (JAX handles TPU pod slices automatically); silently no-ops for
    single-process runs so the call is safe everywhere.
    """
    if num_processes is None and coordinator_address is None:
        env_procs = os.environ.get("JAX_NUM_PROCESSES")
        if env_procs is None or int(env_procs) <= 1:
            logger.info("single-process run; jax.distributed not initialized")
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d / %d, %d local of %d "
        "global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def make_global_mesh(axis="nu"):
    """1-D mesh over every global device (wavelength sharding)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def make_batch_nu_mesh(n_batch=None):
    """2-D (batch x nu) mesh: batch across hosts (DCN), nu within a host
    (ICI) — atmospheres are independent, so the slow axis carries no
    communication, and the nu axis's (collective-free) partition rides the
    fast interconnect."""
    devices = np.asarray(jax.devices())
    n_hosts = jax.process_count()
    if n_batch is None:
        n_batch = n_hosts if n_hosts > 1 else 1
    if len(devices) % n_batch:
        raise ValueError(
            f"{len(devices)} devices not divisible into {n_batch} batch rows"
        )
    grid = devices.reshape(n_batch, -1)
    return Mesh(grid, ("batch", "nu"))
