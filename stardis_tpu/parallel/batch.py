"""Batched synthesis of many atmospheres (data parallelism).

BASELINE.json config 5: a Teff/logg grid of MARCS models synthesized
together.  The reference has no multi-model path at all (SURVEY.md §2.10 —
its only parallelism is threads); TPU-natively a batch of atmospheres is a
vmapped leading axis, sharded across devices with a 'batch' mesh axis.

All models in a batch must share the config (opacity sources, line window,
theta count) and depth-point count; temperatures, densities/abundances and
geometry vary per model.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stardis_tpu.pipeline import (
    SimulationPlan,
    build_simulation_plan,
    line_window_tiers,
    stage_plasma_and_lines,
    stage_spectrum,
)
from stardis_tpu.radiation_field.solver import (
    calculate_spherical_ray,
    gauss_legendre_thetas,
)


@dataclasses.dataclass
class BatchInputs:
    temperatures: np.ndarray  # [B, D]
    n_elem: np.ndarray  # [B, E, D]
    ray_distances: np.ndarray  # [B, G, T]
    # per-model spherical flux correction (r_outer/r_ref)^2, or None for
    # plane-parallel batches (reference applies it per model at
    # radiation_field_solvers/base.py:340-344)
    photospheric_correction: np.ndarray | None = None  # [B]
    # per-model tabulated-opacity sigma tables (one [B, D, N] array per
    # plan.file_sources entry, same order), or None when the plan has no
    # file sources — the tables depend on each model's temperatures, so
    # the template plan's baked sigmas would silently be wrong for any
    # member whose temperature structure differs
    file_sigmas: tuple | None = None


def make_batch(config, atom_data, stellar_models, tracing_nus_hz,
               dtype=np.float64):
    """(template_plan, BatchInputs) for a homogeneous model batch."""
    plan = build_simulation_plan(
        config, atom_data, stellar_models[0], tracing_nus_hz, dtype=dtype
    )
    return plan, collect_batch_inputs(config, stellar_models, plan,
                                      dtype=dtype)


def collect_batch_inputs(config, stellar_models, plan,
                         dtype=np.float64) -> BatchInputs:
    """Per-model arrays for an existing template plan (reusable by serving
    so repeated batches hit run_batch's compiled-stage cache)."""
    thetas, _ = gauss_legendre_thetas(int(config.no_of_thetas))
    n_depth = len(plan.temperatures)

    temps, n_elem, rays, corrs = [], [], [], []
    for i, model in enumerate(stellar_models):
        if model.no_of_depth_points != n_depth:
            raise ValueError("all models in a batch need equal depth points")
        if bool(model.spherical) != bool(plan.inward_rays):
            raise ValueError(
                f"batch model {i} geometry (spherical="
                f"{bool(model.spherical)}) does not match the template "
                f"plan (spherical={bool(plan.inward_rays)})"
            )
        temps.append(np.asarray(model.temperatures, dtype=dtype))
        # align element rows to the plan tables' sorted-Z order
        n_elem.append(
            model.composition.elemental_number_density.loc[plan.tables.zs]
            .values.astype(dtype)
        )
        r = np.asarray(model.geometry.r, dtype=dtype)
        if model.spherical:
            rays.append(calculate_spherical_ray(thetas, r).astype(dtype))
            ref_r = float(np.asarray(model.geometry.reference_r))
            corrs.append((r[-1] / ref_r) ** 2)
        else:
            rays.append(
                (np.diff(r)[:, None] / np.cos(thetas)[None, :]).astype(dtype)
            )
    file_sigmas = None
    if plan.file_sources:
        from stardis_tpu.opacities.file_tables import sigma_file

        lambdas_aa = 2.99792458e18 / plan.tracing_nus
        file_cfg = config.opacity.file
        per_source = []
        for name, _sig, _dplan in plan.file_sources:
            per_source.append(
                np.stack(
                    [
                        sigma_file(
                            lambdas_aa, t, file_cfg[name], name
                        ).astype(dtype)
                        for t in temps
                    ]
                )
            )  # [B, D, N]
        file_sigmas = tuple(per_source)
    return BatchInputs(
        temperatures=np.stack(temps),
        n_elem=np.stack(n_elem),
        ray_distances=np.stack(rays),
        photospheric_correction=(
            np.asarray(corrs, dtype=dtype) if corrs else None
        ),
        file_sigmas=file_sigmas,
    )


# jit re-traces when the Python callable is new, so building closures per
# call would recompile every run_batch invocation; cache compiled stages by
# plan identity (+ tier content for stage 2), evicting oldest entries so
# one-shot plans don't pin executables forever.
# id(plan) is a safe key because each cached jitted closure holds a strong
# reference to its plan, so a live cache entry keeps its plan's id from
# being reused; eviction drops the closure and the plan together.
_STAGE1_CACHE = {}
_STAGE2_CACHE = {}
_SEG_CACHE = {}  # segmented_spectrum's compiled segment programs
_CACHE_LIMIT = 32
_CACHE_LOCK = __import__("threading").Lock()


def _cache_get_or_make(cache, key, factory):
    """Atomic get-or-create: concurrent run_batch callers for the same key
    share ONE jitted closure (so the 20-40 s trace/compile happens once —
    JAX serializes concurrent first calls on the same executable)."""
    with _CACHE_LOCK:
        value = cache.get(key)
        if value is None:
            if len(cache) >= _CACHE_LIMIT:
                cache.pop(next(iter(cache)))
            value = cache[key] = factory()
    return value


def _window_fingerprint(window):
    import hashlib

    h = hashlib.md5()
    for key in sorted(window):
        tiers = window[key]
        if hasattr(tiers, "histogram"):  # BlockedTiers
            h.update(str(tiers.block).encode())
            h.update(str(tiers.core_half).encode())
            for li, bi, w in tiers.tiers:
                h.update(str(w).encode())
                h.update(np.ascontiguousarray(li).tobytes())
                h.update(np.ascontiguousarray(bi).tobytes())
        else:
            for li, w in tiers:
                h.update(str(w).encode())
                h.update(np.ascontiguousarray(li).tobytes())
    return h.hexdigest()


def batch_window_tiers(plan, state, lq):
    """Window tiers from the batch-max adaptive window per line (the tier
    index arrays must be batch-independent; CLAUDE.md invariant — with
    depth blocking they are per-(line, depth-block), still batch-free)."""
    if not lq:
        return 0
    from stardis_tpu.opacities.line_kernel import (
        assign_window_tiers,
        split_core_half,
        window_pixels,
    )

    window = {}
    for key, (alpha, gamma, doppler) in lq.items():  # each [B, L, D]
        if plan.window_mode == "accuracy":
            from stardis_tpu.opacities.line_kernel import (
                window_pixels_accuracy,
            )
            from stardis_tpu.pipeline import accuracy_epsilon

            # per-model epsilon; the tier budget takes the batch max
            eps = jax.vmap(lambda s: accuracy_epsilon(plan, s))(state)
            win = window_pixels_accuracy(
                alpha, gamma, doppler, plan.d_nu,
                epsilon=eps[:, None, :],
            )
        else:
            win = window_pixels(alpha, gamma, doppler, plan.d_nu)
        if plan.window_block > 0:
            from stardis_tpu.opacities.line_kernel import (
                blocked_tiers_on_device,
            )

            # batch-max then block-max on DEVICE; pull only [L, NB]
            bt = blocked_tiers_on_device(
                jnp.max(win, axis=0), len(plan.temperatures),
                len(plan.tracing_nus), plan.window_block,
            )
            # split-dense core width from the batch-max doppler
            from stardis_tpu.opacities.line_kernel import grid_center_gap_px

            bt.core_half = split_core_half(
                float(jnp.max(doppler)), plan.d_nu,
                center_gap_px=grid_center_gap_px(plan.tracing_nus),
            )
            window[key] = bt
        else:
            win_per_line = np.asarray(jnp.max(win, axis=(0, 2)))
            window[key] = assign_window_tiers(
                win_per_line, len(plan.tracing_nus)
            )
    return window


def run_batch(plan: SimulationPlan, batch: BatchInputs, mesh: Mesh | None = None,
              chunk=None):
    """Synthesize all atmospheres; returns F_nu [B, D, N].

    With a mesh (axis 'batch'), inputs/outputs shard over the batch axis —
    embarrassingly parallel, no collectives.  Compiled stages are cached per
    plan (and per window-tier content), so repeated batches with the same
    tier layout run compile-free.
    """
    temps = jnp.asarray(batch.temperatures)
    n_elem = jnp.asarray(batch.n_elem)
    rays = jnp.asarray(batch.ray_distances)
    # plane-parallel members get a neutral correction of 1 so the vmapped
    # stage has one signature either way
    corr = (
        jnp.asarray(batch.photospheric_correction)
        if batch.photospheric_correction is not None
        else jnp.ones(temps.shape[0], dtype=temps.dtype)
    )
    sigmas = (
        tuple(jnp.asarray(s) for s in batch.file_sigmas)
        if batch.file_sigmas
        else ()
    )

    if mesh is not None:
        sharding = NamedSharding(mesh, P("batch"))
        temps = jax.device_put(temps, sharding)
        n_elem = jax.device_put(n_elem, sharding)
        rays = jax.device_put(rays, sharding)
        corr = jax.device_put(corr, sharding)
        sigmas = tuple(jax.device_put(s, sharding) for s in sigmas)

    key1 = id(plan)
    stage1 = _cache_get_or_make(
        _STAGE1_CACHE,
        key1,
        lambda: jax.jit(
            jax.vmap(lambda t, n: stage_plasma_and_lines(plan, t, n))
        ),
    )
    state, lq = stage1(temps, n_elem)
    from stardis_tpu.pipeline import validate_line_quants

    validate_line_quants(lq)

    window = batch_window_tiers(plan, state, lq)

    mesh_key = (
        (tuple(mesh.axis_names), tuple(np.shape(mesh.devices)))
        if mesh is not None
        else None
    )
    key2 = (
        id(plan),
        chunk,
        len(sigmas),
        mesh_key,
        _window_fingerprint(window) if isinstance(window, dict) else window,
    )
    def _make_stage2():
        if mesh is not None and "nu" in mesh.axis_names:
            # 2-D batch x nu mesh: every device owns one (model-chunk,
            # wavelength-chunk) tile (DP x the sequence-parallel analogue)
            from stardis_tpu.parallel.sharding import shard_batch_spectrum

            def two_d(s, q, rd, pc, sg):
                out = shard_batch_spectrum(
                    plan, s, q, window, mesh, rd, pc, sg, chunk=chunk
                )
                # run_batch returns F_nu only on every path; callers who
                # need per-angle I_nus use shard_batch_spectrum directly
                return out[0] if plan.track_individual_intensities else out

            return jax.jit(two_d)

        def one(s, q, rd, pc, sg):
            f_nu, *_ = stage_spectrum(
                plan, s, q, window=window, chunk=chunk,
                ray_distances=rd, photospheric_correction=pc,
                file_sigma_override=sg if sg else None,
            )
            return f_nu

        return jax.jit(jax.vmap(one))

    stage2 = _cache_get_or_make(_STAGE2_CACHE, key2, _make_stage2)
    return stage2(state, lq, rays, corr, sigmas)


def make_batch_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("batch",))
