"""End-to-end simulation pipeline.

Two-phase TPU-first design (SURVEY.md §7):

1. ``build_simulation_plan`` — host-side "compile": read config/model/atom
   data, select lines in the tracing window, precompute static index maps,
   interpolate file cross-sections, build geometry/quadrature. Everything
   NumPy/pandas; runs once.
2. device stages (pure JAX, jitted):
   * ``stage_plasma_and_lines`` — LTE solve + per-line alpha/gamma/Doppler;
   * ``stage_spectrum``      — continuum opacities, windowed line-profile
     accumulation, blackbody source, formal solution -> F_nu.

The split point exists because the adaptive line-window width (a *static*
kernel shape parameter) depends on stage-1 results; the host pulls a single
[L] reduction between stages and chooses the window tier.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from stardis_tpu.opacities import continuum as cont
from stardis_tpu.opacities.file_tables import sigma_file
from stardis_tpu.opacities.line_kernel import (
    BlockedTiers,
    accumulate_line_opacity,
    accumulate_line_opacity_blocked,
    accumulate_line_opacity_tiered,
    assign_window_tiers,
    choose_window,
    grid_min_step,
    line_center_indices,
    window_pixels,
    window_pixels_accuracy,
)
from stardis_tpu.opacities.lines import (
    LineData,
    compute_line_quantities,
    prepare_line_data,
)
from stardis_tpu.plasma.lte import DevicePlasmaTables, device_tables, solve_lte
from stardis_tpu.plasma.tables import PlasmaTables, build_plasma_tables
from stardis_tpu.radiation_field.blackbody import blackbody_flux_at_nu
from stardis_tpu.radiation_field.solver import (
    calculate_spherical_ray,
    gauss_legendre_thetas,
    raytrace,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class BFSpecies:
    cutoff_frequencies: np.ndarray  # [K] Hz
    level_flat: np.ndarray  # [K] flat level indices
    ion_numbers: np.ndarray  # [K]
    coefficients: np.ndarray  # [K] f32-safe BF coefficients (host f64)


@dataclasses.dataclass
class SimulationPlan:
    tracing_nus: np.ndarray  # [N] descending Hz
    tables: PlasmaTables
    dtables: DevicePlasmaTables
    temperatures: np.ndarray  # [D]
    n_elem: np.ndarray  # [E, D]
    microturbulence_cgs: float
    # opacity sources
    file_sources: list  # [(name, sigmas[D,N], SpeciesDensityPlan)]
    bf: BFSpecies | None
    ff_slots: np.ndarray  # [M]
    ff_ion_numbers: np.ndarray  # [M]
    rayleigh_species: list
    disable_electron_scattering: bool
    line_data: LineData | None
    broadening_flags: tuple
    use_vald_broadening: bool
    # geometry / quadrature
    ray_distances: np.ndarray  # [G, T]
    weights: np.ndarray  # [T]
    inward_rays: bool
    photospheric_correction: float | None
    track_individual_intensities: bool = False
    d_nu: float = 0.0
    window_mode: str = "reference"
    window_epsilon: float = 1e-4
    window_block: int = 8  # depth-block size for tiering; 0 = per-line tiers
    molecule_tables: object | None = None  # plasma.molecules.MoleculeTables
    molecule_line_data: object | None = None  # plasma.molecules.MoleculeLineData
    molecules_coupled: bool = False  # opt-in coupled-network densities


def build_simulation_plan(
    config, atom_data, stellar_model, tracing_nus_hz, dtype=np.float64
) -> SimulationPlan:
    tracing_nus = np.sort(np.asarray(tracing_nus_hz, dtype=dtype))[::-1].copy()
    temps = np.asarray(stellar_model.temperatures, dtype=dtype)
    n_elem_frame = stellar_model.composition.elemental_number_density
    tables = build_plasma_tables(atom_data, n_elem_frame.index.values)
    dtables = device_tables(tables, dtype=jnp.dtype(dtype))
    # tables sort atomic numbers; align the density rows to that order
    n_elem = n_elem_frame.loc[tables.zs].values.astype(dtype)

    opacity = config.opacity

    # --- file opacities (host-interpolated) ---------------------------
    file_sources = []
    lambdas_aa = 2.99792458e18 / tracing_nus  # c in AA/s over Hz
    for source_name, fpath in opacity.file.items():
        sig = sigma_file(lambdas_aa, temps, fpath, source_name)
        plan = cont.plan_species_density(source_name, tables)
        file_sources.append((source_name, sig.astype(dtype), plan))

    # --- hydrogenic bf ------------------------------------------------
    bf = None
    bf_cfg = opacity.bf.to_dict() if hasattr(opacity.bf, "to_dict") else dict(opacity.bf)
    if bf_cfg:
        cutoffs, flats, ions = [], [], []
        h_cgs = 6.62607015e-27
        for spec in bf_cfg:
            plan = cont.plan_species_density(spec + "_bf", tables)
            z, ion = plan.atomic_number, plan.ion_number
            chi_ion = atom_data.ionization_data.loc[(z, ion + 1)]
            for (lz, lion, lnum), flat in tables.level_flat_index.items():
                if lz == z and lion == ion:
                    e_level = tables.level_energy[flat]
                    cutoffs.append((chi_ion - e_level) / h_cgs)
                    flats.append(flat)
                    ions.append(ion)
        bf = BFSpecies(
            cutoff_frequencies=np.asarray(cutoffs, dtype=dtype),
            level_flat=np.asarray(flats, dtype=np.int64),
            ion_numbers=np.asarray(ions, dtype=dtype),
            coefficients=cont.bf_level_coefficients(cutoffs, ions).astype(dtype),
        )

    # --- hydrogenic ff ------------------------------------------------
    ff_cfg = opacity.ff.to_dict() if hasattr(opacity.ff, "to_dict") else dict(opacity.ff)
    ff_slots, ff_ions = [], []
    for spec in ff_cfg:
        plan = cont.plan_species_density(spec + "_ff", tables)
        ff_slots.append(plan.slot)
        ff_ions.append(plan.ion_number)
    ff_slots = np.asarray(ff_slots, dtype=np.int64)
    ff_ions = np.asarray(ff_ions, dtype=dtype)

    # --- lines --------------------------------------------------------
    line_cfg = opacity.line
    line_data = None
    broadening_flags = tuple(line_cfg.broadening)
    use_vald = False
    if not line_cfg.disable:
        use_vald = line_cfg.vald_linelist.use_linelist
        line_data = prepare_line_data(
            atom_data,
            tables,
            tracing_nus.min(),
            tracing_nus.max(),
            use_vald=use_vald,
            # the conditional drop applies to TARDIS-path and shortlist
            # lines when VALD broadening is not in use (reference
            # base.py:413-421, gated only on use_vald_broadening); long-form
            # VALD drops unconditionally inside prepare_line_data
            drop_autoionization=not line_cfg.vald_linelist.use_vald_broadening,
        )
        logger.info("Selected %d lines in the tracing window", line_data.n_lines)

    # --- molecules ----------------------------------------------------
    molecule_tables = None
    molecule_line_data = None
    if not line_cfg.disable and line_cfg.include_molecules:
        from stardis_tpu.plasma.molecules import (
            build_molecule_tables,
            prepare_molecule_line_data,
        )

        molecule_tables = build_molecule_tables(atom_data, tables, temps)
        if use_vald and atom_data.linelist_molecules is not None:
            molecule_line_data = prepare_molecule_line_data(
                atom_data,
                molecule_tables,
                tracing_nus.min(),
                tracing_nus.max(),
            )
            logger.info(
                "Selected %d molecular lines", molecule_line_data.n_lines
            )

    # --- geometry / quadrature ----------------------------------------
    thetas, weights = gauss_legendre_thetas(int(config.no_of_thetas))
    r = np.asarray(stellar_model.geometry.r, dtype=dtype)
    if stellar_model.spherical:
        ray_distances = calculate_spherical_ray(thetas, r)
        inward_rays = True
        ref_r = float(np.asarray(stellar_model.geometry.reference_r))
        photospheric_correction = float((r[-1] / ref_r) ** 2)
    else:
        dist = np.diff(r)
        ray_distances = dist[:, None] / np.cos(thetas)[None, :]
        inward_rays = False
        photospheric_correction = None

    micro = stellar_model.microturbulence
    micro_cgs = float(micro.cgs.value) if hasattr(micro, "cgs") else float(micro)
    if getattr(line_cfg, "disable_microturbulence", False):
        micro_cgs = 0.0

    return SimulationPlan(
        tracing_nus=tracing_nus,
        tables=tables,
        dtables=dtables,
        temperatures=temps,
        n_elem=n_elem,
        microturbulence_cgs=micro_cgs,
        file_sources=file_sources,
        bf=bf,
        ff_slots=ff_slots,
        ff_ion_numbers=ff_ions,
        rayleigh_species=list(opacity.rayleigh),
        disable_electron_scattering=bool(opacity.disable_electron_scattering),
        line_data=line_data,
        broadening_flags=broadening_flags,
        use_vald_broadening=bool(
            use_vald and line_cfg.vald_linelist.use_vald_broadening
        ) if not line_cfg.disable else False,
        ray_distances=ray_distances.astype(dtype),
        weights=weights.astype(dtype),
        inward_rays=inward_rays,
        photospheric_correction=photospheric_correction,
        track_individual_intensities=bool(
            config.result_options.return_radiation_field
        ),
        d_nu=grid_min_step(tracing_nus),
        window_mode=str(line_cfg.get("window_mode", "reference")),
        window_epsilon=float(line_cfg.get("window_epsilon", 1e-4)),
        window_block=int(line_cfg.get("window_block", 8)),
        molecules_coupled=bool(line_cfg.get("molecules_coupled", False)),
        molecule_tables=molecule_tables,
        molecule_line_data=molecule_line_data,
    )


# ----------------------------------------------------------------------
# device stages
# ----------------------------------------------------------------------

def stage_plasma_and_lines(plan: SimulationPlan, temps, n_elem):
    """Jittable: LTE solve + per-line quantities.

    Returns (state, quants) where quants maps "atomic" / "molecular" to
    (alpha, gamma, doppler) triples, or None when no lines are configured.
    """
    state = solve_lte(temps, n_elem, plan.dtables)
    quants = {}
    if plan.line_data is not None and plan.line_data.n_lines > 0:
        quants["atomic"] = compute_line_quantities(
            plan.line_data,
            state,
            temps,
            plan.microturbulence_cgs,
            plan.broadening_flags,
            dtype=temps.dtype,
            use_vald_broadening=plan.use_vald_broadening,
        )
    if (
        plan.molecule_line_data is not None
        and plan.molecule_line_data.n_lines > 0
    ):
        from stardis_tpu.plasma.molecules import (
            compute_molecule_line_quantities,
        )

        quants["molecular"] = compute_molecule_line_quantities(
            plan.molecule_line_data,
            plan.molecule_tables,
            state,
            temps,
            plan.microturbulence_cgs,
            plan.broadening_flags,
            dtype=temps.dtype,
            coupled=plan.molecules_coupled,
        )
    return state, (quants or None)


def accuracy_epsilon(plan, state):
    """Per-depth absolute truncation threshold [1/cm]: epsilon_rel times the
    ACTUAL total continuum extinction (its minimum over the tracing grid),
    so wing truncation is bounded relative to the local continuum whatever
    dominates it — H- in solar-type stars, Thomson/H bf in hot stars.

    Always evaluated on the full unpadded grid from the plan (the sharded
    path computes it once outside shard_map), so tier choice and in-kernel
    masks see identical values sharded and unsharded.
    """
    tracing = jnp.asarray(plan.tracing_nus, dtype=state.t.dtype)
    opac = compute_continuum(plan, state, tracing)
    total = None
    for val in opac.values():
        total = val if total is None else total + val
    return plan.window_epsilon * jnp.min(total, axis=1)


def validate_line_quants(line_quants):
    """Reference parity: NaN/inf line quantities abort the run (reference
    plasma/base.py:162-165, 291-294).  All per-set flags are reduced on
    device and pulled in ONE host transfer (tunnel round-trips are
    expensive; see CLAUDE.md)."""
    if not line_quants:
        return
    flags = jnp.stack(
        [
            jnp.isfinite(arr).all()
            for triple in line_quants.values()
            for arr in triple
        ]
    )
    if not bool(flags.all()):
        bad = np.asarray(flags).reshape(len(line_quants), 3)
        names = list(line_quants.keys())
        detail = ", ".join(
            f"{names[i]}:{'alpha gamma doppler'.split()[j]}"
            for i in range(bad.shape[0])
            for j in range(3)
            if not bad[i, j]
        )
        raise ValueError(
            f"Some line quantities ({detail}) are nan, inf, -inf. "
            "Something went wrong!"
        )


def line_window_tiers(plan, line_quants, state=None):
    """Host-side: pull each line's depth-max adaptive window and bucket the
    line sets into window tiers (one small device->host transfer of [L])."""
    import jax.numpy as _jnp

    if not line_quants:
        return 0
    n_nu = len(plan.tracing_nus)
    eps = None
    if plan.window_mode == "accuracy":
        if state is None:
            raise ValueError("accuracy window mode needs the plasma state")
        eps = accuracy_epsilon(plan, state)[None, :]
    tiers = {}
    for key, (alpha, gamma, doppler) in line_quants.items():
        if plan.window_mode == "accuracy":
            win = window_pixels_accuracy(
                alpha, gamma, doppler, plan.d_nu, epsilon=eps
            )
        else:
            win = window_pixels(alpha, gamma, doppler, plan.d_nu)
        if plan.window_block > 0:
            # block-max on DEVICE, pull only [L, NB]
            from stardis_tpu.opacities.line_kernel import (
                blocked_tiers_on_device,
            )

            bt = blocked_tiers_on_device(
                win, len(plan.temperatures), n_nu, plan.window_block
            )
            # static core half-width for the split dense path: beyond it,
            # |dnu|/doppler > 15.5 for every line/depth, so the far wings
            # can run the cheap region-I Voigt (see _accumulate_dense_split);
            # the center-gap term absorbs chirped-grid step variation
            from stardis_tpu.opacities.line_kernel import (
                grid_center_gap_px,
                split_core_half,
            )

            bt.core_half = split_core_half(
                float(_jnp.max(line_quants[key][2])), plan.d_nu,
                center_gap_px=grid_center_gap_px(plan.tracing_nus),
            )
            tiers[key] = bt
        else:
            win_per_line = np.asarray(_jnp.max(win, axis=1))
            tiers[key] = assign_window_tiers(win_per_line, n_nu)
    return tiers


def max_window_pixels(quants, d_nu):
    """Host-pullable scalar: the largest adaptive window over all line sets."""
    import jax.numpy as _jnp

    win = 0.0
    for triple in (quants or {}).values():
        alpha, gamma, doppler = triple
        win = max(win, float(_jnp.max(window_pixels(alpha, gamma, doppler, d_nu))))
    return win


def compute_continuum(plan: SimulationPlan, state, tracing_nus, nu_offset=None,
                      file_sigma_override=None):
    """Jittable: all continuum sources -> dict of [D, N] arrays.

    nu_offset: when given (sharded execution), file-table sigmas — which were
    interpolated on the *global* grid — are dynamically sliced to the local
    [D, n_local] chunk starting at that offset.
    file_sigma_override: optional tuple of traced [D, N_global] arrays (one
    per plan.file_sources entry, same order) replacing the plan's baked
    sigmas — the serving layer re-interpolates them host-side when a
    request's temperatures drift from the plan's.
    """
    n_nu = tracing_nus.shape[0]
    out = {}
    for i, (name, sig, dplan) in enumerate(plan.file_sources):
        density = cont.species_density(dplan, state, plan.tables)
        if file_sigma_override is not None:
            sig_dev = jnp.asarray(file_sigma_override[i], dtype=density.dtype)
        else:
            sig_dev = jnp.asarray(sig, dtype=density.dtype)
        if nu_offset is not None:
            # axis_index is int32; match the zero index's dtype to it
            off = jnp.asarray(nu_offset)
            zero = jnp.zeros((), dtype=off.dtype)
            sig_dev = jax.lax.dynamic_slice(
                sig_dev, (zero, off), (sig_dev.shape[0], n_nu)
            )
        out[f"alpha_file_{name}"] = cont.calc_alpha_file(sig_dev, density)

    if plan.bf is not None and len(plan.bf.level_flat):
        level_densities = state.level_number_density[
            jnp.asarray(plan.bf.level_flat)
        ]
        out["alpha_bf"] = cont.calc_alpha_bf_hydrogenic(
            tracing_nus,
            level_densities,
            jnp.asarray(plan.bf.cutoff_frequencies, dtype=level_densities.dtype),
            jnp.asarray(plan.bf.coefficients, dtype=level_densities.dtype),
        )

    if len(plan.ff_slots):
        ion_densities = state.ion_number_density[jnp.asarray(plan.ff_slots)]
        out["alpha_ff"] = cont.calc_alpha_ff_hydrogenic(
            tracing_nus,
            ion_densities,
            jnp.asarray(plan.ff_ion_numbers, dtype=ion_densities.dtype),
            state.electron_densities,
            state.t,
        )

    if plan.rayleigh_species:
        densities = {}
        for name in plan.rayleigh_species:
            if name == "H":
                densities["H"] = state.ion_number_density[plan.tables.slot_of(1, 0)]
            elif name == "He":
                densities["He"] = state.ion_number_density[plan.tables.slot_of(2, 0)]
            elif name == "H2":
                densities["H2"] = state.h2_density
        out["alpha_rayleigh"] = cont.calc_alpha_rayleigh(tracing_nus, densities)

    out["alpha_electron"] = cont.calc_alpha_electron(
        state.electron_densities, n_nu, disable=plan.disable_electron_scattering
    )
    return out


_PLAN_CORRECTION = "plan"


def stage_spectrum(
    plan: SimulationPlan, state, line_quants, window, chunk: int = 1024,
    ray_distances=None, photospheric_correction=_PLAN_CORRECTION,
    file_sigma_override=None,
):
    """Jittable (static: window, chunk): opacities + formal solution.

    window: int, or dict of per-line-set tier lists from line_window_tiers.
    ray_distances: optional [G, T] override (used by the batched runner,
    where each atmosphere has its own geometry).
    photospheric_correction: the sentinel "plan" applies the plan's static
    (r/r_ref)^2; the batched runner passes each model's own correction as a
    traced scalar instead (reference applies it per model at
    radiation_field_solvers/base.py:340-344).
    file_sigma_override: see compute_continuum."""
    tracing_nus = jnp.asarray(plan.tracing_nus, dtype=state.t.dtype)
    opacities = compute_continuum(
        plan, state, tracing_nus, file_sigma_override=file_sigma_override
    )

    # the line kernels consume the grid ONLY through dnu = grid - line_nu;
    # shifting both by a reference frequency (in float64, host-side) before
    # the dtype cast removes the catastrophic f32 cancellation of two
    # ~4.5e14 Hz values (ulp ~3e7 Hz ~ 4% of a 0.01 AA pixel otherwise)
    nu_ref = float(plan.tracing_nus[len(plan.tracing_nus) // 2])
    tracing_centered = jnp.asarray(
        plan.tracing_nus - nu_ref, dtype=state.t.dtype
    )

    line_quants = line_quants or {}
    eps = (
        accuracy_epsilon(plan, state)[None, :]
        if plan.window_mode == "accuracy"
        else plan.window_epsilon
    )

    def accumulate(key, line_nus_host, triple):
        alpha, gamma, doppler = triple
        centers = line_center_indices(plan.tracing_nus, line_nus_host)
        line_nu_dev = jnp.asarray(line_nus_host - nu_ref, dtype=alpha.dtype)
        centers_dev = jnp.asarray(centers)
        spec = window[key] if isinstance(window, dict) else window
        if isinstance(spec, BlockedTiers):
            return accumulate_line_opacity_blocked(
                tracing_centered, line_nu_dev, centers_dev,
                alpha, gamma, doppler,
                blocked=spec, d_nu=plan.d_nu, chunk=chunk,
                window_mode=plan.window_mode,
                window_epsilon=eps,
                center_idx_host=centers,
            )
        if isinstance(spec, (list, tuple)):
            return accumulate_line_opacity_tiered(
                tracing_centered, line_nu_dev, centers_dev,
                alpha, gamma, doppler,
                tiers=spec, d_nu=plan.d_nu, chunk=chunk,
                window_mode=plan.window_mode,
                window_epsilon=eps,
            )
        return accumulate_line_opacity(
            tracing_centered, line_nu_dev, centers_dev, alpha, gamma, doppler,
            window=int(spec), d_nu=plan.d_nu, chunk=chunk,
            window_mode=plan.window_mode,
            window_epsilon=eps,
        )

    if "atomic" in line_quants:
        alpha, gamma, doppler = line_quants["atomic"]
        opacities["alpha_line_at_nu"] = accumulate(
            "atomic", plan.line_data.nu, line_quants["atomic"]
        )
        opacities["alpha_line_at_nu_gammas"] = gamma
        opacities["alpha_line_at_nu_doppler_widths"] = doppler
    if "molecular" in line_quants:
        m_alpha, m_gamma, m_doppler = line_quants["molecular"]
        opacities["molecule_alpha_line_at_nu"] = accumulate(
            "molecular", plan.molecule_line_data.nu, line_quants["molecular"]
        )
        opacities["molecule_alpha_line_at_nu_gammas"] = m_gamma
        opacities["molecule_alpha_line_at_nu_doppler_widths"] = m_doppler

    total = None
    for key, val in opacities.items():
        if "gammas" in key or "doppler" in key:
            continue
        total = val if total is None else total + val

    if ray_distances is None:
        ray_distances = jnp.asarray(plan.ray_distances, dtype=total.dtype)
    if (
        isinstance(photospheric_correction, str)
        and photospheric_correction == _PLAN_CORRECTION
    ):
        photospheric_correction = plan.photospheric_correction
    source = blackbody_flux_at_nu(tracing_nus, state.t)
    f_nu, i_nus = raytrace(
        total,
        source,
        ray_distances,
        jnp.asarray(plan.weights, dtype=total.dtype),
        inward_rays=plan.inward_rays,
        photospheric_correction=photospheric_correction,
        track_individual_intensities=plan.track_individual_intensities,
    )
    return f_nu, total, opacities, i_nus


def run_simulation(plan: SimulationPlan, chunk: int = 1024):
    """Execute both stages with jit; returns (F_nu, totals, opacities, I_nus,
    state, window)."""
    temps = jnp.asarray(plan.temperatures)
    n_elem = jnp.asarray(plan.n_elem)

    stage1 = jax.jit(lambda t, n: stage_plasma_and_lines(plan, t, n))
    state, line_quants = stage1(temps, n_elem)

    validate_line_quants(line_quants)

    window = line_window_tiers(plan, line_quants, state)

    stage2 = jax.jit(
        lambda s, lq: stage_spectrum(plan, s, lq, window=window, chunk=chunk)
    )
    f_nu, total, opacities, i_nus = stage2(state, line_quants)
    return f_nu, total, opacities, i_nus, state, window
