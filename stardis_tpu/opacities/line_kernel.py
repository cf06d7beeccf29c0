"""Line-profile accumulation onto the spectral grid.

This replaces the reference's hot loop ``calc_alan_entries``
(opacities_solvers/base.py:487-592: Numba prange over lines with per-thread
scratch arrays).  TPU-native formulation:

* the spectral grid is static; each line touches only a window of grid
  points around its center (the reference's adaptive window,
  base.py:561-575, reproduced exactly via a per-(line,depth) pixel mask);
* lines are processed in fixed-size chunks via lax.scan; each chunk
  evaluates the branchless Voigt profile over [chunk, depth, window] and
  scatter-adds into the [n_nu, depth] accumulator — XLA's scatter-add is
  deterministic, so sharded and unsharded runs agree bit-for-bit per dtype
  (the analogue of the reference's parallel==serial test);
* the window width W is a static kernel parameter chosen on host from the
  per-line maximum adaptive window (two-phase execution: quantities first,
  then accumulation).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from stardis_tpu.opacities.voigt import voigt_profile

MIN_WINDOW_PIXELS = 10  # reference base.py:565-567
WINDOW_SCALE = 20.0  # reference base.py:561-563


def grid_min_step(tracing_nus_desc):
    """Smallest frequency step of the (descending) grid
    (reference base.py:524-526).  A single-point grid has no step; return
    +inf so the adaptive window collapses to the forced minimum."""
    grid = np.asarray(tracing_nus_desc)
    if grid.size < 2:
        return float("inf")
    return float(-np.max(np.diff(grid)))


def line_center_indices(tracing_nus_desc, line_nus):
    """Index of the grid point closest-from-above to each line center in the
    descending grid (reference base.py:556-558)."""
    grid = np.asarray(tracing_nus_desc)
    reversed_grid = grid[::-1]
    return (len(grid) - np.searchsorted(reversed_grid, np.asarray(line_nus))).astype(
        np.int64
    )


def window_pixels(alpha, gamma, doppler, d_nu):
    """Adaptive per-(line, depth) half-window in spectral pixels
    (reference base.py:561-567)."""
    win = (gamma + doppler) * alpha / d_nu * WINDOW_SCALE
    return jnp.maximum(float(MIN_WINDOW_PIXELS), win)


def window_pixels_accuracy(alpha, gamma, doppler, d_nu, epsilon=1e-12):
    """Accuracy-controlled half-window: truncate the profile where its
    opacity contribution alpha*phi drops below ``epsilon`` [1/cm].

    ``epsilon`` may be a scalar or a per-depth [D] array (broadcasts against
    the [L, D] line arrays) — the pipeline passes
    epsilon_rel * (continuum-opacity proxy per depth), so the truncation
    error is bounded *relative to the local continuum*.

    Documented divergence from the reference heuristic (which scales the
    window by the raw line alpha and in practice sends most lines to the
    full grid — its own comment at base.py:564-566 concedes this).  Here the
    cutoff follows the profile's actual decay:

    * Lorentzian far wing: alpha gamma/(pi^2 dnu^2) = eps
        -> dnu = sqrt(alpha gamma / (pi^2 eps))
    * Gaussian core: alpha e^{-x^2}/(sqrt(pi) dw) = eps
        -> x = sqrt(max(0, ln(alpha/(sqrt(pi) dw eps))))

    plus a floor of 4 Doppler+Lorentz widths to always resolve the core.
    Wider never changes physics (only adds true wing opacity); narrower is
    bounded by epsilon in absolute extinction.
    """
    lorentz = jnp.sqrt(alpha * gamma / (jnp.pi**2 * epsilon))
    core = jnp.log(alpha / (jnp.sqrt(jnp.pi) * doppler * epsilon))
    gauss = doppler * jnp.sqrt(jnp.maximum(core, 0.0))
    floor = 4.0 * (gamma + doppler)
    dnu_cut = jnp.maximum(jnp.maximum(lorentz, gauss), floor)
    return jnp.maximum(float(MIN_WINDOW_PIXELS), dnu_cut / d_nu)


TIER_WINDOWS = (128, 512, 2048, 8192)

# A tier whose window is at least 1/DENSE_WINDOW_FRACTION of the grid runs
# the dense full-grid path instead of the windowed scatter (v5e scatter is
# payload-bound at ~1.5 GB/s; measured crossover ~1/64 on the 100k-line
# Sim100AA workload).  Narrower tiers prefer the panelized path below; the
# per-pixel scatter survives only as the host-index-free fallback.
DENSE_WINDOW_FRACTION = 64

# Tiers whose window is at most 1/PANELIZE_MAX_FRACTION of the grid are
# split+panelized when host center indices are available: full-Voigt cores
# in small panels (+ region-I far wings in window-wide panels when the
# window exceeds the core), via dynamic 3-panel slice updates grouped by
# center panel — no scatter rows at all.  Above the fraction, the dense /
# split-dense full-grid paths win.  (A two-slot WIDE-row scatter variant
# was measured and removed: XLA scatter-add throughput is payload-bound at
# ~1.5 GB/s regardless of row shape — see docs/performance.md.)
PANELIZE_MAX_FRACTION = 4


def use_panelized(window, n_nu):
    return PANELIZE_MAX_FRACTION * window <= n_nu


def is_dense_tier(window, n_nu):
    return DENSE_WINDOW_FRACTION * window >= n_nu


def auto_chunk(chunk, memory_budget_bytes, row_width, bdim, itemsize,
               n_items) -> int:
    """Shared chunk-size rule for the scan kernels (was copy-pasted four
    times — round-5 review): the memory budget divided by ~4 live
    [chunk, bdim, row_width] arrays, sublane-aligned, floored so the
    scan stays under ~4096 iterations (scans with ~8k+ trip counts
    fault the TPU runtime; observed on a 150k-point grid where the
    budget alone drove the chunk down to 27), and capped at the item
    count.  An explicit ``chunk`` skips the budget math but keeps the
    item-count cap."""
    c = chunk
    if c is None:
        c = memory_budget_bytes // (4 * bdim * row_width * itemsize)
        c = max(32, (c // 8) * 8, -(-n_items // 4096))
        c = -(-c // 8) * 8
    return int(min(c, max(8, n_items)))


def grid_center_gap_px(tracing_nus_desc) -> int:
    """Worst-case line-to-center-pixel distance in MINIMUM-step units.

    A line sits within one LOCAL grid step of its assigned center pixel
    (line_center_indices picks nearest-from-above), and on chirped grids
    — e.g. wavelength-uniform, where the frequency step varies by
    (lambda_max/lambda_min)^2 — one local step is up to
    step_max/step_min minimum steps.  split_core_half must absorb this
    gap or the region-I guarantee silently weakens at the coarse end of
    a wide chirped grid (round-5 review finding; the old flat +2 only
    covered near-uniform grids).  +1 guards the ceil/rounding."""
    grid = np.asarray(tracing_nus_desc)
    if grid.size < 2:
        return 2
    steps = -np.diff(grid)
    ratio = float(steps.max()) / float(steps.min())
    return int(np.ceil(ratio - 1e-6)) + 1  # tolerance: float-rounded
    # uniform grids have ratio = 1 + O(ulp), not exactly 1


def split_core_half(doppler_max, d_nu, margin: float = 1.0,
                    center_gap_px: int = 2) -> int:
    """Static core half-width [pixels] for the split dense path: beyond
    it |x| = |dnu|/doppler > 15.5 for every line/depth (so the Humlicek
    selector, which picks region I at |x|+y > 15.0, provably lands
    there with 0.5 to spare).  ``margin`` scales the doppler budget
    (serving uses its tier margin so hotter requests still fit);
    ``center_gap_px`` is grid_center_gap_px(tracing_nus) — the
    worst-case line-to-center-pixel distance in minimum-step units
    (2 suffices only for near-uniform-frequency grids)."""
    return int(np.ceil(15.5 * doppler_max * margin / d_nu)) + int(
        center_gap_px
    )


def split_panel(core_half) -> int:
    """Panel width for the split dense core pass (128-lane aligned).

    The 3-panel slice update is correct whenever every touched pixel of
    a pair lies within +-panel of its center panel, i.e. the touched
    HALF-width fits one panel (_run_panel_scan's coverage guarantee).
    The core pass touches |offset| < core_half, so the minimal aligned
    panel is ceil(core_half / 128) * 128 — the original 2*core_half
    sizing doubled the per-pair core evals for no coverage benefit.
    Measured effect is modest (Sim100AA stage wall 0.470 -> 0.462 s:
    XLA's subexpression hoisting had already absorbed most of the
    padded-core cost), but it is free and exact (split == plain ==
    oracle at 1e-12 unchanged)."""
    return int(np.ceil(max(core_half or 0, 128) / 128.0) * 128)


def split_enabled(core_half, center_idx_host, n_nu) -> bool:
    return bool(core_half) and center_idx_host is not None and (
        n_nu >= 4 * split_panel(core_half)
    )


@dataclasses.dataclass
class BlockedTiers:
    """Depth-blocked window tiers.

    ``tiers`` is a list of ``(line_idx, block_idx, window)`` where
    ``(line_idx[i], block_idx[i])`` addresses one (line, depth-block) pair
    and ``window`` is that tier's static full window width in pixels.
    ``block`` is the depth-block size; ``n_blocks * block`` is the padded
    depth count.
    """

    tiers: list
    block: int
    n_blocks: int
    # static core half-width [pixels] for the split dense path: outside
    # +-core_half of a line center, |x| = |dnu|/doppler > 15.5 for every
    # line/depth in the set, so the Humlicek selector provably lands in
    # region I and the far wings can use the cheap region-I formula.
    # None disables the split (e.g. when the caller cannot provide host
    # center indices, as under shard_map).
    core_half: int | None = None

    def histogram(self):
        return [(len(li), w) for li, bi, w in self.tiers]


def block_max_windows(win, n_depth, block):
    """DEVICE-side [L, D] -> [L, NB] depth-block max (zero-padded tail).

    The tier assignment only needs each pair's block-max window, so
    reducing on device before the host pull shrinks the device->host
    transfer by the block factor — the [L, D] pull was the slowest
    single host round-trip of the two-stage pipeline through the axon
    tunnel (round 5; ~17 MB/s steady after a ~30-85 s first-fetch
    warmup)."""
    import jax.numpy as _jnp

    n_lines = win.shape[0]
    nb = int(np.ceil(n_depth / block))
    d_pad = nb * block
    if d_pad != n_depth:
        win = _jnp.concatenate(
            [win, _jnp.zeros((n_lines, d_pad - n_depth), win.dtype)], axis=1
        )
    return win.reshape(n_lines, nb, block).max(axis=2)


def assign_window_tiers_from_block_max(win_blk, n_nu, block):
    """Host-side tier assignment from a pre-reduced [L, NB] block-max
    window array (block_max_windows).  See assign_window_tiers_blocked
    for the tiering rationale."""
    win_blk = np.asarray(win_blk)
    n_blocks = win_blk.shape[1]
    full = int(np.ceil(2 * n_nu / 128.0) * 128)
    tiers = []
    assigned = np.zeros_like(win_blk, dtype=bool)
    for w in TIER_WINDOWS:
        if w >= full:
            break
        sel = (~assigned) & (2 * np.ceil(win_blk) <= w)
        li, bi = np.nonzero(sel)
        if len(li):
            tiers.append((li.astype(np.int64), bi.astype(np.int64), int(w)))
        assigned |= sel
    li, bi = np.nonzero(~assigned)
    if len(li):
        tiers.append((li.astype(np.int64), bi.astype(np.int64), full))
    return BlockedTiers(tiers=tiers, block=int(block), n_blocks=n_blocks)


def blocked_tiers_on_device(win, n_depth, n_nu, block, margin: float = 1.0):
    """One-stop tier assignment from a DEVICE [L, D] window array:
    block-max on device, pull only [L, NB], assign tiers host-side
    (optionally scaled by ``margin`` — serving's frozen-tier safety
    factor).  The single entry point for the pipeline, batch and
    serving tier paths."""
    win_blk = np.asarray(block_max_windows(win, n_depth, block))
    if margin != 1.0:
        win_blk = win_blk * margin
    return assign_window_tiers_from_block_max(win_blk, n_nu, block)


def assign_window_tiers_blocked(win_2d, n_nu, block: int = 8):
    """Host-side: bucket (line, depth-block) pairs into window tiers.

    The per-line tier assignment (assign_window_tiers) pays the depth-max
    window at EVERY depth: the line alpha — hence the reference's adaptive
    window (reference opacities_solvers/base.py:561-575) — grows by orders
    of magnitude toward the deep layers, so one deep-forming point drags the
    whole line into a wide tier.  Blocking the depth axis into chunks of
    ``block`` points lets the shallow blocks of the same line stay in the
    cheap 128-pixel tier.  The partition over (line, depth, pixel) stays
    exact: each (line, depth) belongs to exactly one block and each block to
    exactly one tier.
    """
    win = np.asarray(win_2d)
    n_lines, n_depth = win.shape
    n_blocks = int(np.ceil(n_depth / block))
    d_pad = n_blocks * block
    if d_pad != n_depth:
        win = np.pad(win, ((0, 0), (0, d_pad - n_depth)))
    win_blk = win.reshape(n_lines, n_blocks, block).max(axis=2)  # [L, NB]
    return assign_window_tiers_from_block_max(win_blk, n_nu, block)


def assign_window_tiers(win_pix_per_line, n_nu):
    """Host-side: bucket lines into window tiers by their (depth-max)
    adaptive half-window.

    Returns a list of (line_indices int64 array, full_window int).  The
    grid-covering tier uses the full padded grid width.  This converts the
    accumulation cost from n_lines * max_window to sum_k n_k * W_k — the
    strong-line tail (e.g. H-alpha, whose window spans the whole grid) no
    longer sets the cost of the 10^5-line bulk.
    """
    win = np.asarray(win_pix_per_line)
    full = int(np.ceil(2 * n_nu / 128.0) * 128)
    tiers = []
    assigned = np.zeros(len(win), dtype=bool)
    for w in TIER_WINDOWS:
        if w >= full:
            break
        sel = (~assigned) & (2 * np.ceil(win) <= w)
        idx = np.nonzero(sel)[0]
        if len(idx):
            tiers.append((idx.astype(np.int64), int(w)))
        assigned |= sel
    rest = np.nonzero(~assigned)[0]
    if len(rest):
        tiers.append((rest.astype(np.int64), full))
    return tiers


def window_overshoot_stats(blocked, win_2d, n_nu):
    """Host-side meter: per-tier scheduled evaluation width vs the width
    the physics needs (round-4 verdict: nothing metered how many masked
    evals the tiering schedules beyond the true per-(line, depth)
    window).

    For every (line, depth-block) pair in tier ``w`` the kernel budgets
    ``min(w, n_nu)`` pixels per depth row — EXCEPT dense-dispatch tiers
    (not panelized and ``is_dense_tier``), which evaluate every local
    pixel (``n_nu`` per row); the meter follows the same dispatch
    predicates so wide tiers are not under-counted (round-5 review
    finding).  The in-kernel mask then zeroes everything outside the
    TRUE adaptive window, so the pair only *needed*
    ``min(2*ceil(win[l, d]), n_nu)`` pixels at each real depth (the same
    quantity the tier assignment compares against ``w`` —
    assign_window_tiers_blocked).  The ratio is the harvestable headroom
    of the tier ladder itself: 1.0 means the budget is exactly the
    physics; 2.0 means half the masked evals are provably zero.  It does
    NOT include lane-padding effects (panels are >=128 wide regardless),
    so tiers below ~the panel width cannot be harvested past that floor.

    Parameters
    ----------
    blocked : BlockedTiers (from assign_window_tiers_blocked).
    win_2d : [L, D] true per-(line, depth) half-windows in pixels
        (window_pixels / window_pixels_accuracy, pulled to host).
    n_nu : grid length in pixels.

    Returns a dict: ``per_tier`` is a list of {window, pairs, scheduled,
    within, overshoot} (eval columns summed over pairs x real depths);
    ``scheduled`` / ``within`` / ``overshoot`` aggregate all tiers.
    """
    win = np.asarray(win_2d, dtype=np.float64)
    n_lines, n_depth = win.shape
    blk, nb = blocked.block, blocked.n_blocks
    need = np.minimum(2.0 * np.ceil(win), float(n_nu))  # [L, D]
    d_pad = blk * nb
    if d_pad != n_depth:
        need = np.pad(need, ((0, 0), (0, d_pad - n_depth)))
    need_blk = need.reshape(n_lines, nb, blk).sum(axis=2)  # [L, NB]
    # real (unpadded) depth rows per block, for the scheduled count
    rows = np.minimum(
        np.maximum(n_depth - np.arange(nb) * blk, 0), blk
    ).astype(np.float64)  # [NB]

    per_tier = []
    sched_total = 0.0
    within_total = 0.0
    for li, bi, w in blocked.tiers:
        li = np.asarray(li)
        bi = np.asarray(bi)
        # dense-dispatch tiers evaluate every local pixel per row
        width = (
            float(n_nu)
            if (not use_panelized(w, n_nu) and is_dense_tier(w, n_nu))
            else float(min(w, n_nu))
        )
        sched = width * float(rows[bi].sum())
        within = float(need_blk[li, bi].sum())
        per_tier.append(
            {
                "window": int(w),
                "pairs": int(len(li)),
                "scheduled": sched,
                "within": within,
                "overshoot": sched / within if within else float("inf"),
            }
        )
        sched_total += sched
        within_total += within
    return {
        "per_tier": per_tier,
        "scheduled": sched_total,
        "within": within_total,
        "overshoot": (
            sched_total / within_total if within_total else float("inf")
        ),
    }


def choose_window(win_pix_max, n_nu):
    """Static full-window width from the largest half-window (host-side)."""
    half = int(min(np.ceil(win_pix_max), n_nu))
    # round up to a multiple of 128 for TPU lane alignment
    w = 2 * half
    w = int(np.ceil(max(w, 2 * MIN_WINDOW_PIXELS) / 128.0) * 128)
    return min(w, int(np.ceil(2 * n_nu / 128.0) * 128))


def _accumulate_dense(
    tracing_nus_desc,  # [N] descending (device; local shard under shard_map)
    p_nu,  # [P]
    p_center,  # [P] center pixel (local coordinates under sharding)
    p_alpha,  # [P, B]
    p_gamma,  # [P, B]
    p_doppler,  # [P, B]
    p_eps,  # [P, B] per-pair accuracy epsilon (ignored in reference mode)
    d_nu: float,
    chunk: int | None = None,
    memory_budget_bytes: int = 1 << 29,
    window_mode: str = "reference",
    phi_fn=None,  # profile evaluator override (e.g. region-I wings)
    off_mask_fn=None,  # extra pixel-offset mask (e.g. |off| >= core_half)
):
    """Dense full-grid accumulation: sum over pairs of window-masked Voigt
    profiles evaluated at EVERY grid point -> [B, N].

    Used for lines whose window covers the whole (local) grid: a windowed
    scatter there evaluates a 2*N-wide padded window per line AND pays the
    scatter's per-row index cost; dense evaluation does N evals per line and
    reduces over the chunk axis with plain adds (VPU-friendly, no scatter).
    The window mask is still applied, so the result is bit-identical in
    content to the scatter path (up to summation order).
    """
    n_nu = tracing_nus_desc.shape[0]
    n_pairs, bdim = p_alpha.shape
    dtype = p_alpha.dtype
    itemsize = jnp.dtype(dtype).itemsize
    c = auto_chunk(chunk, memory_budget_bytes, n_nu, bdim, itemsize,
                   n_pairs)
    pad = (-n_pairs) % c

    def pad1(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, dtype=x.dtype)]
        ) if pad else x

    p_nu = pad1(p_nu, 0.0)
    p_center = pad1(p_center, -(10 * n_nu))
    p_alpha = pad1(p_alpha, 0.0)
    p_gamma = pad1(p_gamma, 1.0)
    p_doppler = pad1(p_doppler, 1.0)
    p_eps = pad1(p_eps, 1.0)
    n_chunks = (n_pairs + pad) // c

    cols = jnp.arange(n_nu)

    def body(acc, data):
        c_nu, c_center, c_alpha, c_gamma, c_doppler, c_eps = data
        off = cols[None, :] - c_center[:, None]  # [C, N] pixel offsets
        dnu = tracing_nus_desc[None, :] - c_nu[:, None]  # [C, N]
        if window_mode == "accuracy":
            win = window_pixels_accuracy(
                c_alpha, c_gamma, c_doppler, d_nu, epsilon=c_eps
            )  # [C, B]
        else:
            win = window_pixels(c_alpha, c_gamma, c_doppler, d_nu)
        iw = jnp.floor(win)
        within = (off[:, None, :] >= -iw[:, :, None]) & (
            off[:, None, :] < iw[:, :, None]
        )  # [C, B, N]
        if off_mask_fn is not None:
            within = within & off_mask_fn(off)[:, None, :]
        phi = (phi_fn or voigt_profile)(
            dnu[:, None, :], c_doppler[:, :, None], c_gamma[:, :, None]
        )
        contrib = jnp.where(within, phi * c_alpha[:, :, None], 0.0)
        return acc + contrib.sum(axis=0), None

    acc0 = jnp.zeros((bdim, n_nu), dtype=dtype) + (
        tracing_nus_desc[None, :] * 0.0
    ).astype(dtype)
    chunks = (
        p_nu.reshape(n_chunks, c),
        p_center.reshape(n_chunks, c),
        p_alpha.reshape(n_chunks, c, bdim),
        p_gamma.reshape(n_chunks, c, bdim),
        p_doppler.reshape(n_chunks, c, bdim),
        p_eps.reshape(n_chunks, c, bdim),
    )
    acc, _ = jax.lax.scan(body, acc0, chunks)
    return acc  # [B, N]


def accumulate_line_opacity(
    tracing_nus_desc,  # [N] descending, device array
    line_nu,  # [L]
    center_idx,  # [L] host-precomputed (static data, device int array)
    alpha,  # [L, D]
    gamma,  # [L, D]
    doppler,  # [L, D]
    window: int,  # static full window width
    d_nu: float,  # static smallest grid step
    chunk: int | None = 1024,
    memory_budget_bytes: int = 1 << 29,
    window_mode: str = "reference",
    window_epsilon=1e-12,  # scalar or per-depth [D] array
):
    """alpha_line_at_nu [D, N] = sum over lines of alpha * phi(nu - nu_line),
    each line restricted to its adaptive window.

    chunk=None sizes the line chunk so the [chunk, depth, window] working set
    stays within memory_budget_bytes."""
    n_nu = tracing_nus_desc.shape[0]
    n_lines, n_depth = alpha.shape
    dtype = alpha.dtype

    if n_lines == 0:
        return jnp.zeros((n_depth, n_nu), dtype=dtype)

    if is_dense_tier(window, n_nu):
        # the window (nearly) covers the whole (local) grid: dense
        # evaluation does n_nu evals/line with plain adds instead of a
        # window-wide scatter (grid-covering windows are padded to 2*n_nu)
        eps = jnp.asarray(window_epsilon, dtype=dtype)
        p_eps = jnp.broadcast_to(eps, (n_lines, n_depth))
        return _accumulate_dense(
            tracing_nus_desc,
            jnp.asarray(line_nu, dtype=dtype),
            jnp.asarray(center_idx),
            alpha, gamma, doppler, p_eps,
            d_nu=d_nu, chunk=chunk,
            memory_budget_bytes=memory_budget_bytes,
            window_mode=window_mode,
        )

    chunk = auto_chunk(chunk, memory_budget_bytes, window, n_depth,
                       jnp.dtype(dtype).itemsize, n_lines)

    # pad lines to a chunk multiple; padded entries get alpha=0 and an
    # out-of-range center so their (masked) contributions vanish
    pad = (-n_lines) % chunk
    def pad1(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, dtype=x.dtype)]
        ) if pad else x

    line_nu_p = pad1(jnp.asarray(line_nu, dtype=dtype))
    center_p = pad1(jnp.asarray(center_idx), fill=-(10 * window))
    alpha_p = pad1(alpha)
    gamma_p = pad1(gamma, fill=1.0)
    doppler_p = pad1(doppler, fill=1.0)

    n_chunks = (n_lines + pad) // chunk
    offsets = jnp.arange(window) - window // 2  # [W]

    def chunk_body(acc, chunk_data):
        c_nu, c_center, c_alpha, c_gamma, c_doppler = chunk_data
        idx_raw = c_center[:, None] + offsets[None, :]  # [C, W]
        in_grid = (idx_raw >= 0) & (idx_raw < n_nu)
        idx = jnp.clip(idx_raw, 0, n_nu - 1)
        dnu = tracing_nus_desc[idx] - c_nu[:, None]  # [C, W]

        if window_mode == "accuracy":
            win = window_pixels_accuracy(
                c_alpha, c_gamma, c_doppler, d_nu, epsilon=window_epsilon
            )  # [C, D]
        else:
            win = window_pixels(c_alpha, c_gamma, c_doppler, d_nu)  # [C, D]
        iw = jnp.floor(win)
        within = (offsets[None, None, :] >= -iw[:, :, None]) & (
            offsets[None, None, :] < iw[:, :, None]
        )  # [C, D, W]
        mask = within & in_grid[:, None, :]

        phi = voigt_profile(
            dnu[:, None, :], c_doppler[:, :, None], c_gamma[:, :, None]
        )  # [C, D, W]
        contrib = jnp.where(mask, phi * c_alpha[:, :, None], 0.0)

        # scatter-add into [N, D]: rows indexed by grid point
        updates = contrib.transpose(0, 2, 1).reshape(-1, n_depth)  # [C*W, D]
        rows = idx.reshape(-1)  # [C*W]
        acc = acc.at[rows].add(updates, mode="drop")
        return acc, None

    chunks = (
        line_nu_p.reshape(n_chunks, chunk),
        center_p.reshape(n_chunks, chunk),
        alpha_p.reshape(n_chunks, chunk, n_depth),
        gamma_p.reshape(n_chunks, chunk, n_depth),
        doppler_p.reshape(n_chunks, chunk, n_depth),
    )
    # derive the accumulator from the grid so it inherits the grid's
    # varying-manual-axes type under shard_map (scan requires carry-in and
    # carry-out variance to match)
    acc0 = jnp.zeros((n_nu, n_depth), dtype=dtype) + (
        tracing_nus_desc[:, None] * 0.0
    ).astype(dtype)
    acc, _ = jax.lax.scan(chunk_body, acc0, chunks)
    return acc.T  # [D, N]


def accumulate_line_opacity_tiered(
    tracing_nus_desc,
    line_nu,
    center_idx,
    alpha,
    gamma,
    doppler,
    tiers,  # list of (host int64 index array, window int)
    d_nu: float,
    chunk: int | None = None,
    window_mode: str = "reference",
    window_epsilon=1e-12,
):
    """Tiered accumulation: each tier's line subset runs the windowed kernel
    at its own (static) window width; results sum exactly."""
    n_nu = tracing_nus_desc.shape[0]
    n_depth = alpha.shape[1]
    out = jnp.zeros((n_depth, n_nu), dtype=alpha.dtype)
    for idx, w in tiers:
        idx_dev = jnp.asarray(idx)
        out = out + accumulate_line_opacity(
            tracing_nus_desc,
            line_nu[idx_dev],
            center_idx[idx_dev],
            alpha[idx_dev],
            gamma[idx_dev],
            doppler[idx_dev],
            window=int(w),
            d_nu=d_nu,
            chunk=chunk,
            window_mode=window_mode,
            window_epsilon=window_epsilon,
        )
    return out


def panel_schedule(
    centers_local_list,  # per shard: [P_s] LOCAL center pixel of each pair
    line_idx_list,  # per shard: [P_s] pair line indices (host numpy)
    block_idx_list,  # per shard: [P_s] pair depth-block indices
    n_nu: int,  # LOCAL grid width (per-shard width under sharding)
    panel: int,  # requested panel width (128-multiple); may be coarsened
    chunk,  # explicit chunk or None (memory-budget auto)
    memory_budget_bytes: int,
    blk: int,
    itemsize: int,
):
    """Host-side panel-grouped chunk schedule, jointly over 1+ shards.

    Pairs are bucketed by the panel containing their center; each bucket is
    padded to a multiple of the chunk size ``c`` and the buckets are
    concatenated, with one slice offset per chunk.  The panel width, chunk
    size and chunk count are chosen JOINTLY over all shards so that under
    shard_map every shard runs the same program on its own schedule
    (schedules are padded with dead chunks — live=False, offset 0 — to the
    max chunk count over shards).

    Coarsening: when any shard's non-empty group count approaches the
    ~4096 scan-trip budget (huge grids at panel=128), the panel doubles —
    touched-halfwidth <= the caller's panel <= the coarsened one, so slice
    coverage stays valid; cost per pair grows with the panel but the trip
    count (and group padding) stays bounded.

    Chunk sizing matches the panel-group size distribution: each group pads
    to a multiple of c, so c far above the typical group size multiplies
    the eval count (measured 7-27x waste on the Sim100AA bulk tier when c
    came from the memory budget alone) — applied to explicit chunks too.

    Returns (li [S, NC*c], bi [S, NC*c], live [S, NC*c],
    offs [S, NC] int32, c, panel).
    """
    n_shards = len(line_idx_list)
    centers_local_list = [np.asarray(x) for x in centers_local_list]
    line_idx_list = [np.asarray(x, dtype=np.int64) for x in line_idx_list]
    block_idx_list = [np.asarray(x, dtype=np.int64) for x in block_idx_list]

    while True:
        n_panels = -(-n_nu // panel)
        panel_of = [
            np.clip(c_l // panel, 0, n_panels - 1)
            for c_l in centers_local_list
        ]
        nonzero = []
        for p_of in panel_of:
            counts = np.bincount(p_of, minlength=n_panels)
            nonzero.append(counts[counts > 0])
        if max((len(nz) for nz in nonzero), default=0) <= 2048 or (
            n_panels <= 1
        ):
            break
        panel *= 2

    pooled = (
        np.concatenate([nz for nz in nonzero if len(nz)])
        if any(len(nz) for nz in nonzero)
        else np.asarray([8])
    )
    c_grp = int(np.percentile(pooled, 75))
    c_grp = -(-c_grp // 8) * 8
    if chunk is None:
        c_mem = memory_budget_bytes // (4 * blk * 3 * panel * itemsize)
        c_mem = max(32, (c_mem // 8) * 8)
        c = max(8, min(c_mem, c_grp))
    else:
        c = max(8, min(int(chunk), c_grp))
    # keep every shard's scan under ~4096 iterations (TPU runtime faults on
    # multi-10k-trip scans); one chunk per non-empty group is the floor
    n_pairs_max = max((len(li) for li in line_idx_list), default=0)
    groups_max = max((len(nz) for nz in nonzero), default=1)
    budget = max(1, 4096 - groups_max)
    c_min_iter = -(-int(n_pairs_max) // budget)
    c = max(c, -(-c_min_iter // 8) * 8)
    c = int(min(c, max(8, n_pairs_max)))

    schedules = []
    for s in range(n_shards):
        li_chunks, bi_chunks, lv_chunks, off_chunks = [], [], [], []
        for g in range(n_panels):
            sel = np.nonzero(panel_of[s] == g)[0]
            if len(sel) == 0:
                continue
            pad_g = (-len(sel)) % c
            li_chunks.append(
                np.concatenate([line_idx_list[s][sel], np.zeros(pad_g, np.int64)])
            )
            bi_chunks.append(
                np.concatenate([block_idx_list[s][sel], np.zeros(pad_g, np.int64)])
            )
            lv_chunks.append(np.arange(len(sel) + pad_g) < len(sel))
            off_chunks.extend([g * panel] * ((len(sel) + pad_g) // c))
        if li_chunks:
            schedules.append(
                (
                    np.concatenate(li_chunks),
                    np.concatenate(bi_chunks),
                    np.concatenate(lv_chunks),
                    np.asarray(off_chunks, np.int32),
                )
            )
        else:
            schedules.append(
                (
                    np.zeros(0, np.int64),
                    np.zeros(0, np.int64),
                    np.zeros(0, bool),
                    np.zeros(0, np.int32),
                )
            )

    nc = max(max(len(off) for *_x, off in schedules), 1)
    li_a = np.zeros((n_shards, nc * c), np.int64)
    bi_a = np.zeros((n_shards, nc * c), np.int64)
    lv_a = np.zeros((n_shards, nc * c), bool)
    off_a = np.zeros((n_shards, nc), np.int32)
    for s, (li_s, bi_s, lv_s, off_s) in enumerate(schedules):
        li_a[s, : len(li_s)] = li_s
        bi_a[s, : len(bi_s)] = bi_s
        lv_a[s, : len(lv_s)] = lv_s
        off_a[s, : len(off_s)] = off_s
    return li_a, bi_a, lv_a, off_a, c, panel


def _run_panel_scan(
    tracing_nus_desc,  # [N] (local grid under sharding)
    line_nu,  # [L] (centered frame)
    center_idx,  # [L] device, local coordinates
    alpha_b,  # [L, NB, B] blocked
    gamma_b,
    doppler_b,
    li,  # [NC*c] pair line indices (host numpy OR traced device array)
    bi,  # [NC*c] pair block indices
    live,  # [NC*c] live mask (False = schedule padding)
    offs,  # [NC] int32 slice offsets in the panel-padded accumulator
    c: int,  # static chunk size
    panel: int,  # static panel width; updates span 3 panels
    phi_fn,  # voigt_profile (cores) or voigt_profile_region1 (far wings)
    off_mask_fn,  # extra pixel mask by signed offset (core/wing selector)
    d_nu: float,
    window_mode: str,
    eps_b,  # scalar or [NB, B] per-depth epsilon
    per_depth_eps: bool,
    acc,  # [n_nu * NB, B] carried accumulator
    blk: int,
    n_blocks: int,
):
    """Device executor for a panel_schedule: a single scan places each
    chunk's [3*panel, NB, B] update at its slice offset with a dynamic
    read-modify-write (sequential in the scan -> deterministic).  One scan
    keeps the HLO small — a Python loop of per-panel scans OOM-killed the
    XLA compile helper.

    This replaces a scatter (per-row dynamic indexing, measured ~10x the
    cost of a dense masked eval on v5e) with dense 3-panel slices whenever
    every touched pixel of a pair provably lies within +-panel of its
    center panel — callers must guarantee touched-halfwidth <= panel.

    The index arrays may be host numpy (single-chip path) or traced device
    arrays (per-shard schedules under shard_map, where each shard receives
    its own slice of the stacked [ndev, ...] schedule but every shard runs
    this same program).
    """
    n_nu = tracing_nus_desc.shape[0]
    dtype = alpha_b.dtype
    total = int(li.shape[0])
    if total == 0:
        return acc
    n_chunks = total // c
    n_panels = -(-n_nu // panel)
    pad_len = panel * (n_panels + 2)

    tr_pad = jnp.concatenate(
        [
            jnp.full((panel,), tracing_nus_desc[0], dtype),
            tracing_nus_desc,
            jnp.full((pad_len - panel - n_nu,), tracing_nus_desc[-1], dtype),
        ]
    )
    li_d, bi_d = jnp.asarray(li), jnp.asarray(bi)
    live_dev = jnp.asarray(live)
    nb_range = jnp.arange(n_blocks)
    p_nu = line_nu[li_d]
    p_cen = jnp.where(live_dev, center_idx[li_d], -(10 * (n_nu + pad_len)))
    p_a = jnp.where(live_dev[:, None], alpha_b[li_d, bi_d], 0.0)
    p_g = gamma_b[li_d, bi_d]
    p_d = doppler_b[li_d, bi_d]
    p_oh = (bi_d[:, None] == nb_range[None, :]).astype(dtype)  # onehot
    if per_depth_eps:
        p_eps = eps_b[bi_d]
    else:
        p_eps = jnp.full((total, blk), eps_b, dtype=dtype)
    offs_d = jnp.asarray(offs, dtype=jnp.int32)
    w3 = 3 * panel
    rel = jnp.arange(w3)

    def win_of(c_alpha, c_gamma, c_doppler, c_eps):
        if window_mode == "accuracy":
            return window_pixels_accuracy(
                c_alpha, c_gamma, c_doppler, d_nu, epsilon=c_eps
            )
        return window_pixels(c_alpha, c_gamma, c_doppler, d_nu)

    def body(acc_pad, data):
        off0, c_nu, c_cen, c_a, c_g, c_d, c_oh, c_eps = data
        tr_slice = jax.lax.dynamic_slice(tr_pad, (off0,), (w3,))
        # padded col -> global pixel: global = padded - panel
        pix = (off0 - panel + rel).astype(dtype)  # [W3]
        in_grid = (pix >= 0) & (pix < n_nu)
        off = pix[None, :] - c_cen[:, None].astype(dtype)  # [C, W3]
        dnu = tr_slice[None, :] - c_nu[:, None]
        win = win_of(c_a, c_g, c_d, c_eps)
        iw = jnp.floor(win)
        within = (off[:, None, :] >= -iw[:, :, None]) & (
            off[:, None, :] < iw[:, :, None]
        )
        mask = (
            within
            & off_mask_fn(off)[:, None, :]
            & in_grid[None, None, :]
        )
        phi = phi_fn(dnu[:, None, :], c_d[:, :, None], c_g[:, :, None])
        contrib = jnp.where(mask, phi * c_a[:, :, None], 0.0)
        upd = jax.lax.dot_general(
            contrib, c_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
        ).transpose(1, 2, 0)  # [W3, NB, B]
        zero = jnp.zeros((), dtype=off0.dtype)
        cur = jax.lax.dynamic_slice(
            acc_pad, (off0, zero, zero), (w3, n_blocks, blk)
        )
        return (
            jax.lax.dynamic_update_slice(acc_pad, cur + upd, (off0, zero, zero)),
            None,
        )

    # seed the panel accumulator with the variance of every contributor
    # under shard_map: the grid varies over 'nu'; on the 2-D batch x nu
    # mesh the line quantities additionally vary over 'batch'
    var0 = (alpha_b.reshape(-1)[0] * 0.0).astype(dtype)
    acc_pad0 = jnp.zeros((pad_len, n_blocks, blk), dtype=dtype) + (
        tr_pad[:, None, None] * 0.0
    ).astype(dtype) + var0
    chunks = (offs_d,) + tuple(
        x.reshape((n_chunks, c) + x.shape[1:])
        for x in (p_nu, p_cen, p_a, p_g, p_d, p_oh, p_eps)
    )
    panel_acc, _ = jax.lax.scan(body, acc_pad0, chunks)
    return acc + panel_acc[panel : panel + n_nu].reshape(n_nu * n_blocks, blk)


def _accumulate_panelized(
    tracing_nus_desc,  # [N]
    line_nu,  # [L] (centered frame)
    center_idx,  # [L] device
    center_idx_host,  # [L] host numpy (panel grouping)
    alpha_b,  # [L, NB, B] blocked
    gamma_b,
    doppler_b,
    line_idx,  # [P] host pair line indices
    block_idx,  # [P] host pair block indices
    blk: int,
    n_blocks: int,
    panel: int,  # static panel width (128-multiple); updates span 3 panels
    phi_fn,  # voigt_profile (cores) or voigt_profile_region1 (far wings)
    off_mask_fn,  # extra pixel mask by signed offset (core/wing selector)
    d_nu: float,
    chunk,
    memory_budget_bytes: int,
    window_mode: str,
    eps_b,  # scalar or [NB, B] per-depth epsilon
    per_depth_eps: bool,
    acc,  # [n_nu * NB, B] carried accumulator
):
    """Panel-grouped accumulation with host index arrays: panel_schedule
    (host grouping/padding) + _run_panel_scan (device scan).  Used for
    (a) the full-Voigt cores of the split dense path and (b) both passes
    of the split wide-window tiers."""
    n_nu = tracing_nus_desc.shape[0]
    dtype = alpha_b.dtype
    line_idx = np.asarray(line_idx, dtype=np.int64)
    if len(line_idx) == 0:
        return acc
    li_a, bi_a, lv_a, off_a, c, panel = panel_schedule(
        [np.asarray(center_idx_host)[line_idx]],
        [line_idx],
        [np.asarray(block_idx, dtype=np.int64)],
        n_nu, panel, chunk, memory_budget_bytes, blk,
        jnp.dtype(dtype).itemsize,
    )
    return _run_panel_scan(
        tracing_nus_desc, line_nu, center_idx,
        alpha_b, gamma_b, doppler_b,
        li_a[0], bi_a[0], lv_a[0], off_a[0], c, panel,
        phi_fn, off_mask_fn, d_nu, window_mode,
        eps_b, per_depth_eps, acc, blk, n_blocks,
    )


def _accumulate_dense_split(
    tracing_nus_desc,  # [N]
    line_nu,  # [L] (centered frame)
    center_idx,  # [L] device
    center_idx_host,  # [L] host numpy (panel grouping)
    alpha_b,  # [L, NB, B] blocked
    gamma_b,
    doppler_b,
    line_idx,  # [P] host pair line indices
    block_idx,  # [P] host pair block indices
    blk: int,
    n_blocks: int,
    core_half: int,
    d_nu: float,
    chunk,
    memory_budget_bytes: int,
    window_mode: str,
    eps_b,  # scalar or [NB, B] per-depth epsilon
    per_depth_eps: bool,
    acc,  # [n_nu * NB, B] carried accumulator
):
    """Split dense accumulation for a grid-covering tier.

    Two exact passes over the (pair, pixel) set:
    * WING (|offset| >= core_half): the region-I Voigt only — provably the
      same formula the branchless kernel selects there — over the whole
      grid, pairs grouped by depth block host-side so the chunk-axis
      reduction is a plain sum (measured equal to the earlier one-hot
      matmul routing — the pass runs at the region-I eval ceiling either
      way — with 70 fewer lines);
    * CORE (|offset| < core_half): full branchless Voigt over a 3-panel
      slice around each pair's center panel (pairs grouped by panel
      host-side; static slice adds, no scatter).
    """
    n_nu = tracing_nus_desc.shape[0]
    dtype = alpha_b.dtype
    # phi/mask selectors from the same meta dicts the sharded program
    # builder emits, so the core/wing boundary convention lives in ONE
    # place (_resolve_phi_mask)
    wing_phi, wing_mask = _resolve_phi_mask(
        {"phi": "region1", "mask": ("wing", core_half)}
    )
    core_phi, core_mask = _resolve_phi_mask(
        {"phi": "voigt", "mask": ("core", core_half)}
    )

    # ---- wing pass: whole grid, region-I only, pairs grouped by depth
    # block host-side; the per-block dense scan reduces over the chunk
    # axis with plain adds (measured at the region-I eval ceiling —
    # ~1.0e11 evals/s on v5e — so this pass is compute-bound, not a
    # routing/scatter artifact)
    for j in range(n_blocks):
        m = block_idx == j
        if not m.any():
            continue
        li_dev = jnp.asarray(line_idx[m])
        if per_depth_eps:
            p_eps_j = jnp.broadcast_to(
                eps_b[j][None, :], (int(m.sum()), blk)
            ).astype(dtype)
        else:
            p_eps_j = jnp.full((int(m.sum()), blk), eps_b, dtype=dtype)
        wing_j = _accumulate_dense(
            tracing_nus_desc,
            line_nu[li_dev],
            center_idx[li_dev],
            alpha_b[li_dev, j],
            gamma_b[li_dev, j],
            doppler_b[li_dev, j],
            p_eps_j,
            d_nu=d_nu,
            chunk=chunk,
            memory_budget_bytes=memory_budget_bytes,
            window_mode=window_mode,
            phi_fn=wing_phi,
            off_mask_fn=wing_mask,
        )  # [blk, N]
        acc = (
            acc.reshape(n_nu, n_blocks, blk)
            .at[:, j, :]
            .add(wing_j.T)
            .reshape(n_nu * n_blocks, blk)
        )

    # ---- core pass: panel-grouped full Voigt (see _accumulate_panelized)
    return _accumulate_panelized(
        tracing_nus_desc, line_nu, center_idx, center_idx_host,
        alpha_b, gamma_b, doppler_b,
        line_idx, block_idx, blk, n_blocks,
        panel=split_panel(core_half),
        phi_fn=core_phi,
        off_mask_fn=core_mask,
        d_nu=d_nu, chunk=chunk,
        memory_budget_bytes=memory_budget_bytes,
        window_mode=window_mode,
        eps_b=eps_b, per_depth_eps=per_depth_eps,
        acc=acc,
    )


def accumulate_line_opacity_blocked(
    tracing_nus_desc,  # [N] descending, device array (or local shard)
    line_nu,  # [L] device
    center_idx,  # [L] device (already offset for sharded execution)
    alpha,  # [L, D]
    gamma,  # [L, D]
    doppler,  # [L, D]
    blocked: BlockedTiers,
    d_nu: float,
    chunk: int | None = None,
    memory_budget_bytes: int = 1 << 29,
    window_mode: str = "reference",
    window_epsilon=1e-12,  # scalar or per-depth [1, D] array
    center_idx_host=None,  # [L] host numpy: enables the split dense path
):
    """Depth-blocked tiered accumulation: each (line, depth-block) pair runs
    at its own tier's window width.  Work per tier is [pairs, block, W_k]
    Voigt evaluations; contributions scatter-add into a flat
    [N * n_blocks, block] accumulator (row = pixel * n_blocks + block), an
    exact partition of the (line, depth, pixel) contribution set — sharded
    and per-line-tier results agree to summation order.
    """
    n_nu = tracing_nus_desc.shape[0]
    n_lines, n_depth = alpha.shape
    dtype = alpha.dtype
    blk, n_blocks = blocked.block, blocked.n_blocks
    d_pad = blk * n_blocks

    # padded depths: alpha=0 (no contribution), widths 1 (finite Voigt)
    alpha_b, gamma_b, doppler_b, eps_b, per_depth_eps = _depth_block_inputs(
        alpha, gamma, doppler, window_epsilon, blk, n_blocks
    )

    itemsize = jnp.dtype(dtype).itemsize

    # accumulator derived from the grid so it inherits the grid's manual-axes
    # variance under shard_map (see accumulate_line_opacity)
    acc = jnp.zeros((n_nu, n_blocks, blk), dtype=dtype) + (
        tracing_nus_desc[:, None, None] * 0.0
    ).astype(dtype)
    acc = acc.reshape(n_nu * n_blocks, blk)

    for line_idx, block_idx, w in blocked.tiers:
        n_pairs = len(line_idx)
        if n_pairs == 0:
            continue
        if (
            use_panelized(w, n_nu)
            and blocked.core_half
            and center_idx_host is not None
        ):
            ch = blocked.core_half
            common = dict(
                blk=blk, n_blocks=n_blocks, d_nu=d_nu, chunk=chunk,
                memory_budget_bytes=memory_budget_bytes,
                window_mode=window_mode,
                eps_b=eps_b, per_depth_eps=per_depth_eps,
            )
            if 4 * ch <= w:
                # split tier: same two exact passes as the split dense
                # path, panelized at the window scale — full-Voigt cores
                # within +-core_half, region-I far wings out to the true
                # window, no scatter rows.  phi/mask selectors come from
                # the SAME meta dicts bucket_pair_programs_per_shard
                # emits (_resolve_phi_mask), so the single-chip and
                # sharded core/wing boundary cannot diverge
                passes = [
                    (split_panel(ch), {"phi": "voigt",
                                       "mask": ("core", ch)}),
                    (int(np.ceil((w // 2) / 128.0) * 128),
                     {"phi": "region1", "mask": ("wing", ch)}),
                ]
            else:
                # core-dominated window: one panelized full-Voigt pass
                # (still removes the scatter rows; 3*panel evals/pair)
                passes = [
                    (int(np.ceil(max(w // 2, 128) / 128.0) * 128),
                     {"phi": "voigt", "mask": ("all",)}),
                ]
            for panel0, meta in passes:
                phi_fn, off_mask_fn = _resolve_phi_mask(meta)
                acc = _accumulate_panelized(
                    tracing_nus_desc, line_nu, center_idx, center_idx_host,
                    alpha_b, gamma_b, doppler_b, line_idx, block_idx,
                    panel=panel0, phi_fn=phi_fn, off_mask_fn=off_mask_fn,
                    acc=acc, **common,
                )
            continue
        if is_dense_tier(w, n_nu):
            core_half = blocked.core_half
            if split_enabled(core_half, center_idx_host, n_nu):
                # split dense: cheap region-I wings + panel-grouped cores
                acc = _accumulate_dense_split(
                    tracing_nus_desc, line_nu, center_idx, center_idx_host,
                    alpha_b, gamma_b, doppler_b,
                    line_idx, block_idx, blk, n_blocks, core_half,
                    d_nu, chunk, memory_budget_bytes, window_mode,
                    eps_b, per_depth_eps, acc,
                )
                continue
            # wide tier: dense evaluation per depth-block group — no
            # scatter (the narrow [*, blk] scatter rows dominate cost
            # otherwise; measured on v5e, scatter rows cost ~10x a dense
            # masked eval) and n_nu evals per pair instead of w for the
            # grid-covering tier (which pads w to 2*n_nu)
            for j in range(n_blocks):
                m = block_idx == j
                if not m.any():
                    continue
                li_dev = jnp.asarray(line_idx[m])
                if per_depth_eps:
                    p_eps = jnp.broadcast_to(
                        eps_b[j][None, :], (int(m.sum()), blk)
                    ).astype(dtype)
                else:
                    p_eps = jnp.full(
                        (int(m.sum()), blk), eps_b, dtype=dtype
                    )
                dense = _accumulate_dense(
                    tracing_nus_desc,
                    line_nu[li_dev],
                    center_idx[li_dev],
                    alpha_b[li_dev, j],
                    gamma_b[li_dev, j],
                    doppler_b[li_dev, j],
                    p_eps,
                    d_nu=d_nu,
                    chunk=chunk,
                    memory_budget_bytes=memory_budget_bytes,
                    window_mode=window_mode,
                )  # [blk, N]
                acc = (
                    acc.reshape(n_nu, n_blocks, blk)
                    .at[:, j, :]
                    .add(dense.T)
                    .reshape(n_nu * n_blocks, blk)
                )
            continue
        c = auto_chunk(chunk, memory_budget_bytes, w, blk, itemsize,
                       n_pairs)
        pad = (-n_pairs) % c
        li = np.concatenate([line_idx, np.zeros(pad, np.int64)]) if pad else line_idx
        bi = np.concatenate([block_idx, np.zeros(pad, np.int64)]) if pad else block_idx
        li_dev = jnp.asarray(li)
        bi_dev = jnp.asarray(bi)

        p_alpha = alpha_b[li_dev, bi_dev]  # [P, B]
        p_gamma = gamma_b[li_dev, bi_dev]
        p_doppler = doppler_b[li_dev, bi_dev]
        p_nu = line_nu[li_dev]
        p_center = center_idx[li_dev]
        if pad:
            # padded pairs: zero alpha and an out-of-grid center
            live = jnp.arange(n_pairs + pad) < n_pairs
            p_alpha = jnp.where(live[:, None], p_alpha, 0.0)
            p_center = jnp.where(live, p_center, -(10 * w))

        n_chunks = (n_pairs + pad) // c
        offsets = jnp.arange(w) - w // 2  # [W]

        def chunk_body(acc_in, data, _w=w, _offsets=offsets):
            c_nu, c_center, c_block, c_alpha, c_gamma, c_doppler, c_eps = data
            idx_raw = c_center[:, None] + _offsets[None, :]  # [C, W]
            in_grid = (idx_raw >= 0) & (idx_raw < n_nu)
            idx = jnp.clip(idx_raw, 0, n_nu - 1)
            dnu = tracing_nus_desc[idx] - c_nu[:, None]  # [C, W]

            if window_mode == "accuracy":
                win = window_pixels_accuracy(
                    c_alpha, c_gamma, c_doppler, d_nu, epsilon=c_eps
                )  # [C, B]
            else:
                win = window_pixels(c_alpha, c_gamma, c_doppler, d_nu)
            iw = jnp.floor(win)
            within = (_offsets[None, None, :] >= -iw[:, :, None]) & (
                _offsets[None, None, :] < iw[:, :, None]
            )  # [C, B, W]
            mask = within & in_grid[:, None, :]

            phi = voigt_profile(
                dnu[:, None, :], c_doppler[:, :, None], c_gamma[:, :, None]
            )  # [C, B, W]
            contrib = jnp.where(mask, phi * c_alpha[:, :, None], 0.0)

            updates = contrib.transpose(0, 2, 1).reshape(-1, blk)  # [C*W, B]
            rows = (idx * n_blocks + c_block[:, None]).reshape(-1)
            return acc_in.at[rows].add(updates, mode="drop"), None

        if per_depth_eps:
            eps_pairs = eps_b[bi_dev].reshape(n_chunks, c, blk)
        else:
            eps_pairs = jnp.broadcast_to(
                jnp.asarray(eps_b, dtype=dtype), (n_chunks, c, 1)
            )
        chunks = (
            p_nu.reshape(n_chunks, c),
            p_center.reshape(n_chunks, c),
            bi_dev.reshape(n_chunks, c),
            p_alpha.reshape(n_chunks, c, blk),
            p_gamma.reshape(n_chunks, c, blk),
            p_doppler.reshape(n_chunks, c, blk),
            eps_pairs,
        )
        acc, _ = jax.lax.scan(chunk_body, acc, chunks)

    out = acc.reshape(n_nu, d_pad)[:, :n_depth]
    return out.T  # [D, N]


def _depth_block_inputs(alpha, gamma, doppler, window_epsilon, blk,
                        n_blocks):
    """Shared depth-blocking preamble of the two blocked entry points
    (was duplicated — round-5 review): pad the [L, D] line quantities to
    the block grid (alpha=0 so padding contributes nothing, widths 1 so
    the Voigt stays finite) and reshape [L, NB, B]; pad a per-depth
    epsilon with +inf (padding can never pass an accuracy threshold).

    Returns (alpha_b, gamma_b, doppler_b, eps_b, per_depth_eps).
    """
    n_lines, n_depth = alpha.shape
    d_pad = blk * n_blocks

    def to_blocks(x, fill):
        if d_pad != n_depth:
            x = jnp.concatenate(
                [x, jnp.full((n_lines, d_pad - n_depth), fill, dtype=x.dtype)],
                axis=1,
            )
        return x.reshape(n_lines, n_blocks, blk)

    alpha_b = to_blocks(alpha, 0.0)
    gamma_b = to_blocks(gamma, 1.0)
    doppler_b = to_blocks(doppler, 1.0)

    eps_b = window_epsilon
    per_depth_eps = hasattr(window_epsilon, "shape") and np.prod(
        window_epsilon.shape
    ) > 1
    if per_depth_eps:
        eps_flat = jnp.reshape(window_epsilon, (-1,))
        if d_pad != n_depth:
            eps_flat = jnp.concatenate(
                [eps_flat, jnp.full((d_pad - n_depth,), jnp.inf, eps_flat.dtype)]
            )
        eps_b = eps_flat.reshape(n_blocks, blk)  # [NB, B]
    return alpha_b, gamma_b, doppler_b, eps_b, per_depth_eps


def _resolve_phi_mask(meta):
    """Static phi/offset-mask selectors from a program meta dict."""
    from stardis_tpu.opacities.voigt import voigt_profile_region1

    phi_fn = (
        voigt_profile_region1 if meta.get("phi") == "region1" else voigt_profile
    )
    mask = meta.get("mask", ("all",))
    if mask[0] == "core":
        ch = mask[1]
        off_mask_fn = lambda off: jnp.abs(off) < ch  # noqa: E731
    elif mask[0] == "wing":
        ch = mask[1]
        off_mask_fn = lambda off: jnp.abs(off) >= ch  # noqa: E731
    else:
        off_mask_fn = lambda off: jnp.ones(off.shape, bool)  # noqa: E731
    return phi_fn, off_mask_fn


def accumulate_pairs_blocked(
    tracing_nus_desc,  # [N] local grid (descending, centered frame)
    line_nu,  # [L] device (centered frame)
    center_idx,  # [L] device, LOCAL pixel coordinates (may be out of range)
    alpha,  # [L, D]
    gamma,  # [L, D]
    doppler,  # [L, D]
    pair_tiers,  # list of (li [P], bi [P], live [P], window int) — legacy —
    #              or, with ``metas``, (li [P], bi [P], live [P], offs|None);
    #              li/bi/live/offs are DEVICE arrays (traced) — unlike the
    #              host-index tiers of accumulate_line_opacity_blocked — so
    #              per-shard pair subsets can differ under shard_map while
    #              every shard runs the same program
    blk: int,
    n_blocks: int,
    d_nu: float,
    chunk: int | None = None,
    memory_budget_bytes: int = 1 << 29,
    window_mode: str = "reference",
    window_epsilon=1e-12,  # scalar or per-depth [1, D] array
    metas=None,  # static per-program dicts (see bucket_pair_programs)
):
    """Depth-blocked tiered accumulation over TRACED (line, depth-block)
    pair lists -> [D, N].

    The shard-aware bucketed sharding path (parallel/sharding.py) assigns
    each shard only the pairs whose tier window overlaps its local pixel
    range; the pair subsets differ per shard, so the index arrays must be
    runtime data, not compile-time constants.  Physics and windowing match
    accumulate_line_opacity_blocked exactly.  Program kinds (``metas``;
    built host-side by parallel.sharding.bucket_pair_programs_per_shard,
    which mirrors accumulate_line_opacity_blocked's panel/split/dense
    structure so the sharded hot path runs the same scatter-free kernels
    as the single-chip one):

    * ``panel``: 3-panel dynamic-slice updates on a host-built, per-shard
      panel_schedule (traced slice offsets), full-Voigt cores and/or
      region-I far wings — no scatter rows;
    * ``dense``: grid-covering (locally dense) programs evaluate every
      local pixel and route each pair to its depth block by a one-hot
      matmul; with ``phi``/``mask`` set this also runs the region-I wing
      pass of the split dense path;
    * ``scatter``: window-masked Voigt rows scatter-add into the flat
      [N * n_blocks, blk] accumulator (``mode="drop"`` keeps the partition
      exact across shards) — the fallback when no host schedule exists;
    * dead (padding) pairs carry live=False: their alpha is zeroed and the
      center is moved off-grid, so they contribute exactly 0.
    """
    n_nu = tracing_nus_desc.shape[0]
    n_lines, n_depth = alpha.shape
    dtype = alpha.dtype
    d_pad = blk * n_blocks
    if n_lines == 0:
        # empty line set: zero [D, N] grid (callers usually guard
        # n_lines > 0, but the var0 carry seed below would IndexError on
        # a size-0 alpha — round-5 review); derived from the grid so it
        # inherits the manual axes under shard_map
        return jnp.zeros((n_depth, n_nu), dtype=dtype) + (
            tracing_nus_desc[None, :] * 0.0
        ).astype(dtype)

    alpha_b, gamma_b, doppler_b, eps_b, per_depth_eps = _depth_block_inputs(
        alpha, gamma, doppler, window_epsilon, blk, n_blocks
    )

    itemsize = jnp.dtype(dtype).itemsize
    nb_range = jnp.arange(n_blocks)
    cols = jnp.arange(n_nu)

    # scan carries must inherit the varying manual axes of EVERY
    # contributor under shard_map: the grid varies over 'nu', and on the
    # 2-D batch x nu mesh the line quantities additionally vary over
    # 'batch' (vmapped state) — seed the accumulator with both
    var0 = (alpha.reshape(-1)[0] * 0.0).astype(dtype)
    acc = jnp.zeros((n_nu, n_blocks, blk), dtype=dtype) + (
        tracing_nus_desc[:, None, None] * 0.0
    ).astype(dtype) + var0
    acc = acc.reshape(n_nu * n_blocks, blk)

    if metas is None:
        programs = [
            (
                (li, bi, live, None),
                {
                    "kind": (
                        "dense" if is_dense_tier(w, n_nu) else "scatter"
                    ),
                    "window": int(w),
                },
            )
            for (li, bi, live, w) in pair_tiers
        ]
    else:
        programs = list(zip(pair_tiers, metas))

    for (li, bi, live, offs), meta in programs:
        n_pairs = int(li.shape[0])
        if n_pairs == 0:
            continue
        if meta["kind"] == "panel":
            phi_fn, off_mask_fn = _resolve_phi_mask(meta)
            acc = _run_panel_scan(
                tracing_nus_desc, line_nu, center_idx,
                alpha_b, gamma_b, doppler_b,
                li, bi, live, offs,
                c=meta["chunk"], panel=meta["panel"],
                phi_fn=phi_fn, off_mask_fn=off_mask_fn,
                d_nu=d_nu, window_mode=window_mode,
                eps_b=eps_b, per_depth_eps=per_depth_eps,
                acc=acc, blk=blk, n_blocks=n_blocks,
            )
            continue
        w = meta["window"]
        dense = meta["kind"] == "dense"
        width = n_nu if dense else w
        c = auto_chunk(chunk, memory_budget_bytes, width, blk, itemsize,
                       n_pairs)
        pad = (-n_pairs) % c
        if pad:
            li = jnp.concatenate([li, jnp.zeros(pad, li.dtype)])
            bi = jnp.concatenate([bi, jnp.zeros(pad, bi.dtype)])
            live = jnp.concatenate([live, jnp.zeros(pad, bool)])

        p_alpha = jnp.where(live[:, None], alpha_b[li, bi], 0.0)
        p_gamma = gamma_b[li, bi]
        p_doppler = doppler_b[li, bi]
        p_nu = line_nu[li]
        p_center = jnp.where(live, center_idx[li], -(10 * (n_nu + width)))
        if per_depth_eps:
            p_eps = eps_b[bi]  # [P, B]
        else:
            p_eps = jnp.full((n_pairs + pad, blk), eps_b, dtype=dtype)
        n_chunks = (n_pairs + pad) // c

        def win_of(c_alpha, c_gamma, c_doppler, c_eps):
            if window_mode == "accuracy":
                return window_pixels_accuracy(
                    c_alpha, c_gamma, c_doppler, d_nu, epsilon=c_eps
                )
            return window_pixels(c_alpha, c_gamma, c_doppler, d_nu)

        if dense:
            phi_fn, off_mask_fn = _resolve_phi_mask(meta)
            p_oh = (bi[:, None] == nb_range[None, :]).astype(dtype)  # [P, NB]

            def dense_body(carry, data, _phi=phi_fn, _om=off_mask_fn):
                c_nu, c_cen, c_a, c_g, c_d, c_oh, c_eps = data
                off = cols[None, :] - c_cen[:, None]  # [C, N] int offsets
                dnu = tracing_nus_desc[None, :] - c_nu[:, None]
                win = win_of(c_a, c_g, c_d, c_eps)  # [C, B]
                iw = jnp.floor(win)
                within = (off[:, None, :] >= -iw[:, :, None]) & (
                    off[:, None, :] < iw[:, :, None]
                )  # [C, B, N]
                within = within & _om(off)[:, None, :]
                phi = _phi(
                    dnu[:, None, :], c_d[:, :, None], c_g[:, :, None]
                )
                contrib = jnp.where(within, phi * c_a[:, :, None], 0.0)
                # route each pair to its depth block: one-hot matmul over
                # the chunk axis (deterministic, MXU-friendly)
                upd = jax.lax.dot_general(
                    contrib, c_oh,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                )  # [B, N, NB]
                return carry + upd, None

            carry0 = jnp.zeros((blk, n_nu, n_blocks), dtype=dtype) + (
                tracing_nus_desc[None, :, None] * 0.0
            ).astype(dtype) + var0
            chunks = tuple(
                x.reshape((n_chunks, c) + x.shape[1:])
                for x in (p_nu, p_center, p_alpha, p_gamma, p_doppler,
                          p_oh, p_eps)
            )
            out, _ = jax.lax.scan(dense_body, carry0, chunks)
            acc = acc + out.transpose(1, 2, 0).reshape(n_nu * n_blocks, blk)
            continue

        offsets = jnp.arange(w) - w // 2  # [W]

        def chunk_body(acc_in, data, _offsets=offsets):
            c_nu, c_center, c_block, c_alpha, c_gamma, c_doppler, c_eps = data
            idx_raw = c_center[:, None] + _offsets[None, :]  # [C, W]
            in_grid = (idx_raw >= 0) & (idx_raw < n_nu)
            idx = jnp.clip(idx_raw, 0, n_nu - 1)
            dnu = tracing_nus_desc[idx] - c_nu[:, None]  # [C, W]

            win = win_of(c_alpha, c_gamma, c_doppler, c_eps)  # [C, B]
            iw = jnp.floor(win)
            within = (_offsets[None, None, :] >= -iw[:, :, None]) & (
                _offsets[None, None, :] < iw[:, :, None]
            )  # [C, B, W]
            mask = within & in_grid[:, None, :]

            phi = voigt_profile(
                dnu[:, None, :], c_doppler[:, :, None], c_gamma[:, :, None]
            )  # [C, B, W]
            contrib = jnp.where(mask, phi * c_alpha[:, :, None], 0.0)

            updates = contrib.transpose(0, 2, 1).reshape(-1, blk)  # [C*W, B]
            rows = (idx * n_blocks + c_block[:, None]).reshape(-1)
            return acc_in.at[rows].add(updates, mode="drop"), None

        chunks = (
            p_nu.reshape(n_chunks, c),
            p_center.reshape(n_chunks, c),
            bi.reshape(n_chunks, c),
            p_alpha.reshape(n_chunks, c, blk),
            p_gamma.reshape(n_chunks, c, blk),
            p_doppler.reshape(n_chunks, c, blk),
            p_eps.reshape(n_chunks, c, blk),
        )
        acc, _ = jax.lax.scan(chunk_body, acc, chunks)

    out = acc.reshape(n_nu, d_pad)[:, :n_depth]
    return out.T  # [D, N]


def accumulate_line_opacity_reference(
    tracing_nus_desc, line_nu, alpha, gamma, doppler
):
    """Slow NumPy oracle implementing the identical windowing rules, used by
    tests to validate the chunked device kernel."""
    grid = np.asarray(tracing_nus_desc)
    n_nu = len(grid)
    n_lines, n_depth = np.asarray(alpha).shape
    d_nu = grid_min_step(grid)
    centers = line_center_indices(grid, line_nu)
    out = np.zeros((n_depth, n_nu))
    alpha = np.asarray(alpha)
    gamma = np.asarray(gamma)
    doppler = np.asarray(doppler)
    from scipy.special import wofz

    for li in range(n_lines):
        for d in range(n_depth):
            win = max(
                MIN_WINDOW_PIXELS,
                (gamma[li, d] + doppler[li, d]) * alpha[li, d] / d_nu * WINDOW_SCALE,
            )
            lo = max(centers[li] - int(win), 0)
            hi = min(centers[li] + int(win), n_nu)
            dnu = grid[lo:hi] - line_nu[li]
            z = (dnu + 1j * gamma[li, d] / (np.sqrt(np.pi) * np.pi)) / doppler[li, d]
            phi = wofz(z).real / (np.sqrt(np.pi) * doppler[li, d])
            out[d, lo:hi] += phi * alpha[li, d]
    return out
