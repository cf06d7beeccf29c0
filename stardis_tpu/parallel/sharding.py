"""Wavelength-axis sharding of the spectral pipeline.

The reference's only parallel axis is frequency/lines via Numba threads
(SURVEY.md §2.10); the TPU-native scaling model shards the wavelength axis
over a device mesh (the analogue of sequence parallelism):

* the frequency grid is partitioned contiguously across devices;
* line tables and the plasma state are replicated (small: [L] and [S, D]);
* each device evaluates continuum + line windows + the formal solution for
  its own grid chunk.  A line whose profile window crosses a shard boundary
  contributes to both shards, but every (line, pixel) pair lands on exactly
  ONE shard — out-of-shard scatter rows are dropped — so the sharded sum is
  an exact partition: no halo exchange and no collectives in the hot path,
  giving embarrassingly-linear scaling over ICI/DCN.
* the depth recurrence (associative scan) stays on-chip per frequency
  column, as planned in SURVEY.md §7.

Entry point: shard_spectrum(plan, state, line_quants, window, mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stardis_tpu.opacities.line_kernel import (
    BlockedTiers,
    accumulate_line_opacity,
    accumulate_line_opacity_blocked,
    accumulate_line_opacity_tiered,
    line_center_indices,
)
from stardis_tpu.pipeline import SimulationPlan, compute_continuum
from stardis_tpu.radiation_field.blackbody import blackbody_flux_at_nu
from stardis_tpu.radiation_field.solver import raytrace


def make_nu_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("nu",))


def _pad_to_multiple(arr, multiple, axis=0, edge=True):
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, 0
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    mode = "edge" if edge else "constant"
    return np.pad(arr, widths, mode=mode), pad


def shard_spectrum(
    plan: SimulationPlan,
    state,
    line_quants,
    window,
    mesh: Mesh,
    chunk: int | None = 1024,
    ray_distances=None,  # [G, T] override (serving: per-request geometry)
):
    """Sharded equivalent of pipeline.stage_spectrum (F_nu only).

    window: int, or a dict of per-line-set tier lists from
    pipeline.line_window_tiers (same contract as stage_spectrum).
    Returns F_nu [D, N] with the nu axis sharded over the mesh; when
    plan.track_individual_intensities is set (result_options.
    return_radiation_field, reference radiation_field/base.py:64-68) it
    returns (F_nu, I_nus [D, N, T]) instead, I_nus sharded over nu too.
    """
    import dataclasses

    ndev = mesh.shape["nu"]
    nus_padded, pad = _pad_to_multiple(plan.tracing_nus, ndev)
    n_padded = len(nus_padded)
    per_shard = n_padded // ndev
    dtype = state.t.dtype

    # accuracy epsilon uses the full unpadded grid; compute it once here
    # (eager, replicated) so every shard masks with identical values
    if plan.window_mode == "accuracy":
        from stardis_tpu.pipeline import accuracy_epsilon

        eps_global = accuracy_epsilon(plan, state)[None, :]
    else:
        eps_global = plan.window_epsilon

    if pad and plan.file_sources:
        plan = dataclasses.replace(
            plan,
            file_sources=[
                (name, _pad_to_multiple(sig, ndev, axis=1)[0], dplan)
                for name, sig, dplan in plan.file_sources
            ],
        )

    # centered frame for the line kernels: dnu = grid - line_nu loses ~4%
    # of a pixel to f32 cancellation at 4.5e14 Hz (see pipeline.stage_spectrum)
    nu_ref = float(plan.tracing_nus[len(plan.tracing_nus) // 2])
    line_sets = {}
    if line_quants:
        if "atomic" in line_quants:
            line_sets["atomic"] = (
                jnp.asarray(plan.line_data.nu - nu_ref, dtype=dtype),
                jnp.asarray(line_center_indices(nus_padded, plan.line_data.nu)),
            )
        if "molecular" in line_quants:
            line_sets["molecular"] = (
                jnp.asarray(plan.molecule_line_data.nu - nu_ref, dtype=dtype),
                jnp.asarray(
                    line_center_indices(nus_padded, plan.molecule_line_data.nu)
                ),
            )

    nu_full = jnp.asarray(nus_padded, dtype=dtype)
    nu_full_centered = jnp.asarray(nus_padded - nu_ref, dtype=dtype)

    # padded tail: weight 0 so duplicated edge frequencies don't distort
    # nothing downstream (they're sliced off at the end anyway)

    def shard_fn(state_rep, lq_rep):
        shard_id = jax.lax.axis_index("nu")
        offset = shard_id * per_shard
        nus_local = jax.lax.dynamic_slice(nu_full, (offset,), (per_shard,))
        nus_local_centered = jax.lax.dynamic_slice(
            nu_full_centered, (offset,), (per_shard,)
        )

        opac = compute_continuum(plan, state_rep, nus_local, nu_offset=offset)
        total = None
        for key, val in opac.items():
            total = val if total is None else total + val

        eps = eps_global
        for key, (alpha, gamma, doppler) in (lq_rep or {}).items():
            line_nu_dev, centers_dev = line_sets[key]
            spec = window[key] if isinstance(window, dict) else window
            if isinstance(spec, BlockedTiers):
                alpha_line = accumulate_line_opacity_blocked(
                    nus_local_centered, line_nu_dev, centers_dev - offset,
                    alpha, gamma, doppler,
                    blocked=spec, d_nu=plan.d_nu, chunk=chunk,
                    window_mode=plan.window_mode, window_epsilon=eps,
                )
            elif isinstance(spec, (list, tuple)):
                alpha_line = accumulate_line_opacity_tiered(
                    nus_local_centered, line_nu_dev, centers_dev - offset,
                    alpha, gamma, doppler,
                    tiers=spec, d_nu=plan.d_nu, chunk=chunk,
                    window_mode=plan.window_mode, window_epsilon=eps,
                )
            else:
                alpha_line = accumulate_line_opacity(
                    nus_local_centered, line_nu_dev, centers_dev - offset,
                    alpha, gamma, doppler,
                    window=int(spec), d_nu=plan.d_nu, chunk=chunk,
                    window_mode=plan.window_mode, window_epsilon=eps,
                )
            total = total + alpha_line

        source = blackbody_flux_at_nu(nus_local, state_rep.t)
        rays = (
            jnp.asarray(plan.ray_distances, dtype=dtype)
            if ray_distances is None
            else jnp.asarray(ray_distances, dtype=dtype)
        )
        f_nu_local, i_nus_local = raytrace(
            total,
            source,
            rays,
            jnp.asarray(plan.weights, dtype=dtype),
            inward_rays=plan.inward_rays,
            photospheric_correction=plan.photospheric_correction,
            track_individual_intensities=plan.track_individual_intensities,
        )
        if plan.track_individual_intensities:
            return f_nu_local, i_nus_local  # [D, n_loc], [D, n_loc, T]
        return f_nu_local  # [depth, per_shard]

    track = plan.track_individual_intensities
    smapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(None, "nu"), P(None, "nu", None)) if track
        else P(None, "nu"),
    )
    out = smapped(state, line_quants)
    f_nu, i_nus = out if track else (out, None)
    if pad:
        f_nu = f_nu[:, : len(plan.tracing_nus)]
        if i_nus is not None:
            i_nus = i_nus[:, : len(plan.tracing_nus), :]
    if track:
        return f_nu, i_nus
    return f_nu


