"""Persistent XLA compilation cache.

The first compile of the two-stage pipeline on a TPU chip costs 20-40 s
per distinct (grid shape, tier layout, depth count) — the dominant
latency of a cold CLI run or a freshly restarted serving process.  XLA
can persist compiled executables to disk and reload them across
processes; this module wires that up behind one call so production
entry points (CLI ``--compile-cache``, serving, grid scans) start hot
after the first run.

The reference has no analogue (Numba caches per-process only unless
``cache=True`` is set per-function; its CI recompiles every run).

The cache key includes the XLA flags, backend, and HLO — a stale or
cross-device cache entry misses rather than corrupting results.  Entries
are written only for compiles slower than ``min_compile_secs`` so tiny
host-side jits don't litter the directory.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

ENV_VAR = "STARDIS_COMPILE_CACHE"


def enable_compilation_cache(cache_dir=None, min_compile_secs: float = 1.0):
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``cache_dir`` defaults to the ``STARDIS_COMPILE_CACHE`` environment
    variable; if neither is set this is a no-op (returns None).  The
    directory is created if missing.  Returns the resolved path.

    Call once, before the first jit execution (later calls re-point the
    cache).  Safe on any backend; entries are keyed by backend + HLO, so
    CPU and TPU runs share a directory without collisions.
    """
    explicit = cache_dir is not None
    if cache_dir is None:
        cache_dir = os.environ.get(ENV_VAR)
    if not cache_dir:
        return None
    path = Path(cache_dir).expanduser()

    import jax

    if not explicit:
        # env-default calls (run_stardis/serving/grid wiring) must not
        # re-point a cache the user already configured explicitly — the
        # CLI --compile-cache flag / a library enable_compilation_cache(
        # dir) call wins over the environment variable
        current = jax.config.jax_compilation_cache_dir
        if current and current != str(path):
            return current
    path.mkdir(parents=True, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    # size floor off: the time floor above is the real gate
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    logger.info("Persistent compilation cache at %s", path)
    return str(path)
