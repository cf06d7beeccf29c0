"""Pallas TPU kernel for line-profile accumulation (EXPERIMENTAL backend).

Status (round 1 bring-up on TPU v5e): compiles and runs natively, matches
the XLA path at 2e-5 in interpret and native modes, but is currently ~60x
SLOWER than the XLA scatter path — the workload is VPU-bound branchless
Voigt evaluation, which XLA's elementwise fusion already schedules near
optimally, while this kernel pays serial (non-double-buffered) DMA stages,
2.3x depth padding to the 128-lane DMA tiling, and per-8-line loop
overhead.  The XLA path (line_kernel.py) remains production.  Known Mosaic
constraints hit during bring-up (kept for future work):
  * dynamic scalar/width-1 lane loads from 1-D VMEM do not lower — per-line
    scalars are stored as [L, 128]-replicated rows read with static [.., 0:1]
    slices;
  * DMA slices require 128-aligned lane extents — depth pads 56 -> 128;
  * 1-D kernel operands can pick XLA layouts (T(512)) that Mosaic rejects —
    the grid row is replicated to [8, N] for aligned (8, tile) blocking.
Next steps: double-buffered stages, bf16 profile evaluation, transposed
[depth, lines] layout to kill the depth padding.

TPU-native replacement for the XLA scatter-add path in line_kernel.py
(which itself replaces the reference's Numba hot loop, SURVEY.md §2.9):

* the spectral grid is cut into lane-aligned tiles; each grid step owns one
  [depth, TILE] accumulator resident in VMEM — no scatter, no HBM
  round-trips for partial sums;
* lines are sorted by center pixel (host side); the contiguous range of
  lines whose windows can touch a tile is precomputed as CSR-style
  (start, count) pairs and scalar-prefetched;
* line data streams through VMEM in fixed DMA stages of LBLK rows (so
  arbitrarily large tiers never overflow VMEM), processed in vector blocks
  of LB=8 lines — no dynamic scalar loads, which Mosaic cannot lower from
  1-D VMEM;
* the Voigt evaluation reuses the branchless real-pair Humlicek w4 from
  stardis_tpu.opacities.voigt — pure jnp, identical numerics in both
  backends — and the adaptive window mask (reference or accuracy mode) is
  applied in-kernel exactly as in the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stardis_tpu.opacities.line_kernel import (
    MIN_WINDOW_PIXELS,
    WINDOW_SCALE,
)
from stardis_tpu.opacities.voigt import PI, SQRT_PI, faddeeva_real

LB = 8  # lines per vector block (sublane granularity)


def _round_up(x, m):
    return int(-(-x // m) * m)


def build_tile_csr(center_idx_sorted, n_nu, tile, half_window):
    """Host-side: for each grid tile, the contiguous [start, count) range of
    (center-sorted) lines whose +-half_window can overlap the tile."""
    n_tiles = _round_up(n_nu, tile) // tile
    centers = np.asarray(center_idx_sorted)
    starts = np.empty(n_tiles, dtype=np.int32)
    counts = np.empty(n_tiles, dtype=np.int32)
    for t in range(n_tiles):
        lo = t * tile - half_window
        hi = (t + 1) * tile + half_window
        s = np.searchsorted(centers, lo, side="left")
        e = np.searchsorted(centers, hi, side="right")
        starts[t] = s
        counts[t] = e - s
    return starts, counts


def _tier_kernel(
    starts_ref,  # scalar prefetch [n_tiles]
    counts_ref,  # scalar prefetch [n_tiles]
    nu_tile_ref,  # [8, TILE] VMEM — this tile's grid frequencies (row 0)
    line_nu_hbm,  # [Lp, 128] ANY (value in lane 0; 128 lanes for DMA tiling)
    center_hbm,  # [Lp, 128] ANY (float32 pixel index in lane 0)
    alpha_hbm,  # [Lp, Dp] ANY
    gamma_hbm,  # [Lp, Dp] ANY
    doppler_hbm,  # [Lp, Dp] ANY
    eps_ref,  # [1, Dp] VMEM — per-depth accuracy threshold (or dummy)
    out_ref,  # [Dp, TILE] VMEM
    lnu_s,  # [LBLK, 128] VMEM scratch
    cen_s,  # [LBLK, 128] VMEM scratch
    a_s,  # [LBLK, Dp]
    g_s,  # [LBLK, Dp]
    d_s,  # [LBLK, Dp]
    sems,  # DMA semaphores (5,)
    *,
    tile,
    lblk,
    n_stages,
    d_nu,
    window_mode,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]

    nu_row = nu_tile_ref[0, :]  # [TILE]
    pix = (t * tile + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tile), 2)).astype(
        jnp.float32
    )  # [1, 1, TILE]
    eps = eps_ref[0, :]  # [Dp]

    def stage(s, acc):
        row0 = start + s * lblk

        def do_stage(acc):
            copies = [
                pltpu.make_async_copy(
                    line_nu_hbm.at[pl.ds(row0, lblk)], lnu_s, sems.at[0]
                ),
                pltpu.make_async_copy(
                    center_hbm.at[pl.ds(row0, lblk)], cen_s, sems.at[1]
                ),
                pltpu.make_async_copy(
                    alpha_hbm.at[pl.ds(row0, lblk)], a_s, sems.at[2]
                ),
                pltpu.make_async_copy(
                    gamma_hbm.at[pl.ds(row0, lblk)], g_s, sems.at[3]
                ),
                pltpu.make_async_copy(
                    doppler_hbm.at[pl.ds(row0, lblk)], d_s, sems.at[4]
                ),
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

            def block(b, acc_in):
                rows = pl.ds(b * LB, LB)
                lnu_blk = lnu_s[rows, 0:1][:, :, None]  # [LB, 1, 1]
                cen_blk = cen_s[rows, 0:1][:, :, None]  # [LB, 1, 1]
                a_blk = a_s[rows, :]  # [LB, Dp]
                g_blk = g_s[rows, :]
                d_blk = d_s[rows, :]

                dnu = nu_row[None, None, :] - lnu_blk
                x = dnu / d_blk[:, :, None]  # [LB, Dp, TILE]
                y = (g_blk / (SQRT_PI * PI) / d_blk)[:, :, None]
                phi = faddeeva_real(x, jnp.broadcast_to(y, x.shape)) / (
                    SQRT_PI * d_blk[:, :, None]
                )

                if window_mode == "accuracy":
                    lorentz = jnp.sqrt(a_blk * g_blk / (PI**2 * eps[None, :]))
                    core = jnp.log(a_blk / (SQRT_PI * d_blk * eps[None, :]))
                    gauss = d_blk * jnp.sqrt(jnp.maximum(core, 0.0))
                    floor = 4.0 * (g_blk + d_blk)
                    win = jnp.maximum(
                        float(MIN_WINDOW_PIXELS),
                        jnp.maximum(jnp.maximum(lorentz, gauss), floor) / d_nu,
                    )
                else:
                    win = jnp.maximum(
                        float(MIN_WINDOW_PIXELS),
                        (g_blk + d_blk) * a_blk / d_nu * WINDOW_SCALE,
                    )
                iw = jnp.floor(win)[:, :, None]  # [LB, Dp, 1]
                off = pix - cen_blk  # [LB, 1, TILE]
                within = (off >= -iw) & (off < iw)
                line_index = row0 + b * LB + jax.lax.broadcasted_iota(
                    jnp.int32, (LB, 1, 1), 0
                )
                live = line_index < (start + count)
                contrib = jnp.where(
                    within & live, phi * a_blk[:, :, None], 0.0
                )
                return acc_in + jnp.sum(contrib, axis=0)

            return jax.lax.fori_loop(0, lblk // LB, block, acc)

        return jax.lax.cond(row0 < start + count, do_stage, lambda a: a, acc)

    acc0 = jnp.zeros(out_ref.shape, out_ref.dtype)
    out_ref[:, :] = jax.lax.fori_loop(0, n_stages, stage, acc0)


def accumulate_line_opacity_pallas(
    tracing_nus_desc,  # [N] device
    line_nu,  # [L] device, SORTED by center index ascending
    center_idx,  # [L] device int, sorted ascending
    alpha,  # [L, D]
    gamma,  # [L, D]
    doppler,  # [L, D]
    window: int,  # full window width (2*half)
    d_nu: float,
    tile_starts,  # [n_tiles] host int32 (LB-aligned; from prepare_tier)
    tile_counts,  # [n_tiles] host int32
    window_mode: str = "reference",
    window_epsilon=None,  # [D] array for accuracy mode
    tile: int = 128,
    lblk: int = 512,
    interpret: bool = False,
):
    """[D, N] line opacity for one window tier (Pallas TPU backend)."""
    n_nu = tracing_nus_desc.shape[0]
    n_lines, n_depth = alpha.shape
    dtype = jnp.float32

    n_pad = _round_up(max(n_nu, tile), tile)
    d_pad = _round_up(max(n_depth, 8), 128)  # DMA lane tiling
    n_tiles = n_pad // tile
    max_count = int(tile_counts.max()) if len(tile_counts) else 1
    n_stages = max(1, -(-(max_count + lblk - 1) // lblk))
    # slack rows so every stage DMA stays in bounds
    lp = _round_up(n_lines + n_stages * lblk + lblk, lblk)

    def pad_lines(arr, fill, shape2=None):
        arr = jnp.asarray(arr)
        widths = ((0, lp - arr.shape[0]),) + (
            ((0, 0),) if arr.ndim > 1 else ()
        )
        out = jnp.pad(arr, widths, constant_values=fill)
        if arr.ndim > 1 and shape2 and shape2 > out.shape[1]:
            out = jnp.pad(out, ((0, 0), (0, shape2 - out.shape[1])))
        return out

    nu_padded = jnp.broadcast_to(
        jnp.pad(jnp.asarray(tracing_nus_desc, dtype), (0, n_pad - n_nu))[
            None, :
        ],
        (8, n_pad),
    )
    lnu = jnp.broadcast_to(
        pad_lines(jnp.asarray(line_nu, dtype), 0.0)[:, None], (lp, 128)
    )
    cen = jnp.broadcast_to(
        pad_lines(
            jnp.asarray(center_idx, dtype), float(-(10 * (window + tile)))
        )[:, None],
        (lp, 128),
    )
    a = pad_lines(jnp.asarray(alpha, dtype), 0.0, d_pad)
    g = pad_lines(jnp.asarray(gamma, dtype), 1.0, d_pad)
    dp_arr = pad_lines(jnp.asarray(doppler, dtype), 1.0, d_pad)
    if d_pad > n_depth:
        g = g.at[:, n_depth:].set(1.0)
        dp_arr = dp_arr.at[:, n_depth:].set(1.0)

    if window_epsilon is None:
        eps_row = jnp.full((1, d_pad), 1.0, dtype)
    else:
        eps_row = jnp.pad(
            jnp.asarray(window_epsilon, dtype).reshape(1, -1),
            ((0, 0), (0, d_pad - n_depth)),
            constant_values=1.0,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda t, *_: (0, t)),  # nu tile
            pl.BlockSpec(memory_space=pl.ANY),  # line_nu [Lp/LB, LB]
            pl.BlockSpec(memory_space=pl.ANY),  # center
            pl.BlockSpec(memory_space=pl.ANY),  # alpha
            pl.BlockSpec(memory_space=pl.ANY),  # gamma
            pl.BlockSpec(memory_space=pl.ANY),  # doppler
            pl.BlockSpec((1, d_pad), lambda t, *_: (0, 0)),  # eps
        ],
        out_specs=pl.BlockSpec((d_pad, tile), lambda t, *_: (0, t)),
        scratch_shapes=[
            pltpu.VMEM((lblk, 128), dtype),
            pltpu.VMEM((lblk, 128), dtype),
            pltpu.VMEM((lblk, d_pad), dtype),
            pltpu.VMEM((lblk, d_pad), dtype),
            pltpu.VMEM((lblk, d_pad), dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )

    kernel = functools.partial(
        _tier_kernel,
        tile=tile,
        lblk=lblk,
        n_stages=n_stages,
        d_nu=float(d_nu),
        window_mode=window_mode,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d_pad, n_pad), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(tile_starts, jnp.int32),
        jnp.asarray(tile_counts, jnp.int32),
        nu_padded,
        lnu,
        cen,
        a,
        g,
        dp_arr,
        eps_row,
    )
    return out[:n_depth, :n_nu]


def prepare_tier(center_idx_host, idx, n_nu, tile, window):
    """Host-side tier prep: sort tier lines by center and build LB-aligned
    CSR (starts rounded down to LB so in-kernel DMA offsets stay aligned;
    counts extended to compensate)."""
    order = idx[np.argsort(center_idx_host[idx], kind="stable")]
    starts, counts = build_tile_csr(
        center_idx_host[order], n_nu, tile, window // 2
    )
    aligned = (starts // LB) * LB
    counts = counts + (starts - aligned)
    return order, aligned, counts


def accumulate_tiered_pallas(
    tracing_nus_desc, line_nu, center_idx, alpha, gamma, doppler, tiers,
    d_nu, window_mode="reference", window_epsilon=None, tile=128,
    interpret=False,
):
    """Tiered Pallas accumulation mirroring accumulate_line_opacity_tiered."""
    n_nu = tracing_nus_desc.shape[0]
    n_depth = alpha.shape[1]
    centers_host = np.asarray(center_idx)
    out = jnp.zeros((n_depth, n_nu), dtype=jnp.float32)
    for idx, w in tiers:
        order, starts, counts = prepare_tier(
            centers_host, idx, n_nu, tile, w
        )
        order_dev = jnp.asarray(order)
        out = out + accumulate_line_opacity_pallas(
            tracing_nus_desc,
            jnp.asarray(line_nu)[order_dev],
            jnp.asarray(center_idx)[order_dev],
            alpha[order_dev],
            gamma[order_dev],
            doppler[order_dev],
            window=int(w),
            d_nu=d_nu,
            tile_starts=starts,
            tile_counts=counts,
            window_mode=window_mode,
            window_epsilon=window_epsilon,
            tile=tile,
            interpret=interpret,
        )
    return out
