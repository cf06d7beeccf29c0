"""Device-memory model for automatic wavelength segmentation.

The formal solution vmaps over theta and materializes a handful of
[theta, depth, n_nu] f32 temporaries (radiation_field/solver.py:
taus/weights/interpolation terms plus the associative-scan internals), and
the opacity stage holds several [depth, n_nu] per-source grids — so a
single chip OOMs once the wavelength grid grows past a few hundred
thousand points (measured v5e envelope: between 300k and 600k points at
20 angles, 56 depth points, 16 GB HBM).  ``choose_nu_segments`` inverts a
calibrated linear model of those costs to pick the smallest serial
segment count whose per-segment footprint fits the device
(parallel.sharding.segmented_spectrum executes the segments serially with
one compile; the partition is exact, so segmentation never changes
physics — only peak memory).

The model is deliberately coarse and errs high: segmenting more finely
than necessary costs only a few extra kernel launches, while
under-segmenting OOMs the chip.  The reference has no analogue (its NumPy
arrays live in host RAM; SURVEY.md section 6 workloads top out at 10k
points).
"""

from __future__ import annotations

import math
import os

import numpy as np

# Live [theta, depth, n_nu] f32 temporaries during the RT sweep, calibrated
# against the measured v5e envelope: at 20 thetas x 56 depths, one chip
# (16 GB) ran 300k points and OOMed at 600k -> ~6 such arrays plus the
# [depth, n_nu]-scale opacity terms put the crossover at ~450k.
RT_LIVE_TEMPS = 6

# Scan working sets (line-kernel chunks) are bounded by the kernels'
# memory_budget_bytes (1 << 29) times the ~4 live arrays per chunk body.
WORKSET_BYTES = 2 << 30

DEFAULT_BYTES_LIMIT = 16 << 30  # v5e HBM per chip
HEADROOM = 0.85

# More serial segments than this is pathological (each segment is a
# device execution; real grids at real HBM sizes need single digits) —
# refusing beats silently scheduling 10^5 executions.
MAX_SEGMENTS = 256


def device_bytes_limit(device=None):
    """HBM capacity of the target device, from memory_stats when the
    backend reports it (TPU does; CPU does not -> default 16 GB)."""
    if device is None:
        import jax

        device = jax.local_devices()[0]
    try:
        stats = device.memory_stats()
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit
    except Exception:
        pass
    return DEFAULT_BYTES_LIMIT


def _itemsize():
    import jax

    return 8 if jax.config.jax_enable_x64 else 4


def per_pixel_bytes(
    n_depth: int,
    n_thetas: int,
    n_alpha_sources: int = 8,
    track_individual_intensities: bool = False,
    itemsize: int | None = None,
) -> int:
    """Device bytes per wavelength pixel of the synthesis stage (the
    linear slope of the memory model, excluding fixed working sets)."""
    if itemsize is None:
        itemsize = _itemsize()
    d_pad = -(-n_depth // 8) * 8
    per_px = (
        RT_LIVE_TEMPS * n_thetas * n_depth  # RT sweep temporaries
        + (n_alpha_sources + 2) * n_depth  # per-source opacity grids + total
        + 3 * d_pad  # line accumulators (flat [N*NB, blk] x panel/carry)
    )
    if track_individual_intensities:
        per_px += n_thetas * n_depth  # the retained I_nus output
    return int(per_px) * int(itemsize)


def estimate_segment_bytes(
    n_nu_seg: int,
    n_depth: int,
    n_thetas: int,
    n_alpha_sources: int = 8,
    track_individual_intensities: bool = False,
    itemsize: int | None = None,
) -> int:
    """Peak device bytes to synthesize one ``n_nu_seg``-point segment
    (excluding the fixed, segment-independent line-quantity arrays)."""
    return (
        per_pixel_bytes(
            n_depth, n_thetas, n_alpha_sources,
            track_individual_intensities, itemsize,
        )
        * int(n_nu_seg)
        + WORKSET_BYTES
    )


def count_alpha_sources(plan) -> int:
    """Number of simultaneously-live [depth, n_nu] opacity grids in a
    plan's continuum+line stage."""
    n = 1  # running total
    n += len(plan.file_sources)
    n += 1 if plan.bf is not None else 0
    n += 1 if len(np.atleast_1d(plan.ff_slots)) else 0
    n += 1 if plan.rayleigh_species else 0
    n += 0 if plan.disable_electron_scattering else 1
    n += 1 if plan.line_data is not None else 0
    n += 1 if plan.molecule_line_data is not None else 0
    return n


def fixed_overhead_bytes(plan, itemsize: int | None = None) -> int:
    """Segment-independent device residents: per-(line, depth) alpha /
    gamma / doppler from stage 1 (atomic + molecular line sets), plus the
    FULL-grid outputs — segment results stay on device until the final
    concatenate, so F_nu [D, N] (and I_nus [D, N, T] when tracked) are
    held twice (parts + concatenated) regardless of the segment count."""
    if itemsize is None:
        itemsize = _itemsize()
    n_depth = len(plan.temperatures)
    n_lines = 0
    if plan.line_data is not None:
        n_lines += len(plan.line_data.nu)
    if plan.molecule_line_data is not None:
        n_lines += len(plan.molecule_line_data.nu)
    n_nu = len(plan.tracing_nus)
    out_cols = 1 + (
        len(plan.weights) if plan.track_individual_intensities else 0
    )
    outputs = 2 * out_cols * n_depth * n_nu * itemsize
    return 3 * n_lines * n_depth * itemsize + outputs


def choose_nu_segments(plan, bytes_limit: int | None = None) -> int:
    """Smallest serial segment count whose per-segment footprint fits the
    device, by the calibrated linear model above.

    ``bytes_limit`` overrides the detected device HBM (tests pass a small
    budget; the ``STARDIS_SEGMENT_BUDGET`` env var does the same for the
    CLI).  Returns at least 1; never more than the grid size.
    """
    env = os.environ.get("STARDIS_SEGMENT_BUDGET")
    if bytes_limit is None and env:
        bytes_limit = int(float(env))
    if bytes_limit is None:
        bytes_limit = device_bytes_limit()

    n_nu = len(plan.tracing_nus)
    n_depth = len(plan.temperatures)
    n_thetas = len(plan.weights)
    itemsize = _itemsize()
    n_sources = count_alpha_sources(plan)
    track = plan.track_individual_intensities

    avail = HEADROOM * bytes_limit - fixed_overhead_bytes(plan, itemsize)
    per_px = per_pixel_bytes(n_depth, n_thetas, n_sources, track, itemsize)
    avail -= WORKSET_BYTES
    if avail < per_px:
        # even a single-pixel segment exceeds the budget: segmentation
        # cannot help (depth x theta alone is too large) — run unsegmented
        # and let the device report the real failure
        return 1
    k = int(min(max(1, math.ceil(n_nu * per_px / avail)), n_nu))
    if k > MAX_SEGMENTS:
        raise ValueError(
            f"auto-segmentation wants {k} serial segments "
            f"({n_nu} points x {per_px} B/px against "
            f"{avail / 1e9:.2f} GB available) — more than the "
            f"{MAX_SEGMENTS}-segment sanity bound. The grid does not "
            "meaningfully fit this device; shard over a mesh or raise "
            "the budget."
        )
    return k
