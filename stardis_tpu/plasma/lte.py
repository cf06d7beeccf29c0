"""Device-side LTE plasma solve (JAX).

Re-implements from scratch the physics the reference obtains from the TARDIS
BasePlasma DAG (reference stardis/plasma/base.py:491-569; required outputs
pinned in SURVEY.md §2.8):

    level Boltzmann factors g e^{-beta E}
    -> partition functions U (segment-sum over ion slots)
    -> Saha factors phi_j = 2 (U_{j+1}/U_j) g_e e^{-beta chi_j}
    -> charge-conservation solve for n_e   (log-space bisection: the charge
       balance is strictly decreasing in n_e, so bisection is exact,
       deterministic and jit/vmap-friendly — no data-dependent iteration)
    -> ion and level number densities
    plus STARDIS-specific species: H-, H2, H2+ (plasma/base.py:62-127).

All Saha algebra runs in log space so the solve is float32-safe on TPU
(Boltzmann exponents reach e^-200 for He II at 3000 K).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stardis_tpu.constants import (
    EV_TO_ERG,
    H2_DISSOCIATION_ENERGY_EV,
    H_CGS,
    H_MINUS_CHI_EV,
    K_B_CGS,
    M_E_CGS,
    M_P_CGS,
    THERMAL_DE_BROGLIE_CONST,
)
from stardis_tpu.plasma.tables import PlasmaTables

# Stancil 1994 H2+ equilibrium constants (reference plasma/base.py:38-57)
H2_PLUS_K_EQUILIBRIUM_CONSTANT = np.array(
    [0.9600, 9.7683, 29.997, 59.599, 265.32, 845.01, 1685.3, 4289.5]
)
H2_PLUS_K_SAMPLE_TEMPS = np.array(
    [3150.0, 4200.0, 5040.0, 6300.0, 8400.0, 12600.0, 18600.0, 25200.0]
)

N_E_BISECTION_ITERS = 80


class DevicePlasmaTables(NamedTuple):
    """PlasmaTables payload as jit-ready arrays (host numpy — embedded as
    compile-time constants; see device_tables on why not device arrays)."""

    slot_element: jnp.ndarray  # [S]
    slot_ion: jnp.ndarray  # [S]
    slot_index: jnp.ndarray  # [E, J]
    chi: jnp.ndarray  # [E, J-1]
    chi_mask: jnp.ndarray  # [E, J-1]
    ion_charges: jnp.ndarray  # [E, J] = 0..J-1 broadcast
    ion_mask: jnp.ndarray  # [E, J] charge state exists
    level_energy: jnp.ndarray  # [L]
    level_g: jnp.ndarray  # [L]
    level_slot: jnp.ndarray  # [L]
    h_slots: jnp.ndarray  # [2] slots of (H I, H II); 0 when H absent
    has_hydrogen: bool


def device_tables(tables: PlasmaTables, dtype=jnp.float64) -> DevicePlasmaTables:
    """Jit-ready constant tables.

    Deliberately HOST numpy arrays, not eager device arrays: the tables
    are closed over the jitted stages as compile-time constants, and
    MLIR lowering embeds numpy constants directly, whereas a
    device-resident constant forces a device->host fetch PER ARRAY at
    lowering time — ~84 s each through the axon tunnel (measured round
    5; the hang looked like a dead chip).  XLA ships the embedded
    constants to the device once, inside the executable."""
    j_max = tables.j_max
    e_count = tables.n_elements
    charges = np.broadcast_to(np.arange(j_max), (e_count, j_max))
    ion_mask = charges < tables.n_ions[:, None]
    try:
        h_slots = np.array([tables.slot_of(1, 0), tables.slot_of(1, 1)])
        has_h = True
    except KeyError:
        h_slots = np.array([0, 0])
        has_h = False
    dtype = np.dtype(dtype)
    return DevicePlasmaTables(
        slot_element=np.asarray(tables.slot_element),
        slot_ion=np.asarray(tables.slot_ion),
        slot_index=np.asarray(tables.slot_index),
        chi=np.asarray(tables.chi, dtype=dtype),
        chi_mask=np.asarray(tables.chi_mask),
        ion_charges=np.asarray(charges, dtype=dtype),
        ion_mask=np.asarray(ion_mask),
        level_energy=np.asarray(tables.level_energy, dtype=dtype),
        level_g=np.asarray(tables.level_g, dtype=dtype),
        level_slot=np.asarray(tables.level_slot),
        h_slots=np.asarray(h_slots, dtype=np.int32),
        has_hydrogen=bool(has_h),
    )


class PlasmaState(NamedTuple):
    """Dense LTE plasma state over (ion-slot/level, depth)."""

    t: jnp.ndarray  # [D] temperatures (t_rad == t_electrons, ref base.py:564)
    beta: jnp.ndarray  # [D] 1/(kT)
    log_g_electron: jnp.ndarray  # [D]
    partition_function: jnp.ndarray  # [S, D]
    electron_densities: jnp.ndarray  # [D]
    ion_number_density: jnp.ndarray  # [S, D]
    level_number_density: jnp.ndarray  # [L, D]
    number_density: jnp.ndarray  # [E, D] elemental
    h_neutral_density: jnp.ndarray  # [D] n(H I); zeros when H absent
    h_minus_density: jnp.ndarray  # [D]
    h2_density: jnp.ndarray  # [D]
    h2_plus_density: jnp.ndarray  # [D]


def _log_partition_functions(dt: DevicePlasmaTables, beta, n_slots):
    """log U[s, d] via logsumexp segment-reduction over levels."""
    # x[l, d] = log g_l - beta_d E_l
    x = jnp.log(dt.level_g)[:, None] - beta[None, :] * dt.level_energy[:, None]
    # segment logsumexp: subtract per-slot max for stability
    seg_max = jax.ops.segment_max(
        x, dt.level_slot, num_segments=n_slots, indices_are_sorted=True
    )
    shifted = jnp.exp(x - seg_max[dt.level_slot])
    seg_sum = jax.ops.segment_sum(
        shifted, dt.level_slot, num_segments=n_slots, indices_are_sorted=True
    )
    return seg_max + jnp.log(seg_sum)


def _log_phi(dt: DevicePlasmaTables, log_u, beta):
    """log Saha factor phi[e, j, d] for transitions j -> j+1."""
    s_lo = dt.slot_index[:, :-1]  # [E, J-1]
    s_hi = dt.slot_index[:, 1:]
    valid = dt.chi_mask
    s_lo_c = jnp.clip(s_lo, 0)
    s_hi_c = jnp.clip(s_hi, 0)
    # log g_electron enters outside; here the U ratio and Boltzmann factor
    log_ratio = log_u[s_hi_c] - log_u[s_lo_c]  # [E, J-1, D]
    lp = jnp.log(2.0) + log_ratio - beta[None, None, :] * dt.chi[..., None]
    return jnp.where(valid[..., None], lp, -jnp.inf)


def _ion_fractions(dt: DevicePlasmaTables, log_phi_tot, log_ne):
    """frac[e, j, d] of each element in charge state j, given log n_e[d]."""
    log_r = log_phi_tot - log_ne[None, None, :]  # [E, J-1, D]
    zeros = jnp.zeros_like(log_r[:, :1, :])
    log_w = jnp.concatenate([zeros, jnp.cumsum(log_r, axis=1)], axis=1)  # [E, J, D]
    log_w = jnp.where(dt.ion_mask[..., None], log_w, -jnp.inf)
    return jax.nn.softmax(log_w, axis=1)


def solve_lte(temperatures, elemental_number_density, dt: DevicePlasmaTables):
    """LTE solve, fully vectorized over depth.

    Parameters
    ----------
    temperatures : [D] K
    elemental_number_density : [E, D] 1/cm^3
    dt : DevicePlasmaTables
    """
    t = temperatures
    n_elem = elemental_number_density
    beta = 1.0 / (K_B_CGS * t)
    n_slots = dt.slot_element.shape[0]

    # fold constants in f64 Python first: 2 pi m_e k_B / h^2 ~ 1.8e10, while
    # the unfolded factors (7.9e-43, 4.4e-53) underflow f32 on TPU
    g_e_const = 2.0 * np.pi * M_E_CGS * K_B_CGS / H_CGS**2
    log_g_electron = 1.5 * (jnp.log(t) + float(np.log(g_e_const)))

    log_u = _log_partition_functions(dt, beta, n_slots)  # [S, D]
    log_phi = _log_phi(dt, log_u, beta)  # [E, J-1, D]
    log_phi_tot = log_phi + log_g_electron[None, None, :]

    # --- charge-conservation bisection on log n_e -----------------------
    # upper bound: every element fully stripped to its highest tracked stage
    elem_max_charge = jnp.sum(dt.ion_mask, axis=1) - 1.0  # [E]
    max_charge = jnp.sum(n_elem * elem_max_charge[:, None], axis=0)  # [D]
    log_hi = jnp.log(max_charge * (1.0 + 1e-6) + 1e-30)
    log_lo = log_hi - 80.0  # n_e spans < 35 decades in any stellar atmosphere

    def total_charge(log_ne):
        frac = _ion_fractions(dt, log_phi_tot, log_ne)  # [E, J, D]
        charge = jnp.sum(frac * dt.ion_charges[..., None], axis=1)  # [E, D]
        return jnp.sum(n_elem * charge, axis=0)  # [D]

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        f = total_charge(mid) - jnp.exp(mid)
        lo = jnp.where(f > 0, mid, lo)
        hi = jnp.where(f > 0, hi, mid)
        return lo, hi

    log_lo, log_hi = jax.lax.fori_loop(
        0, N_E_BISECTION_ITERS, body, (log_lo, log_hi)
    )
    log_ne_star = jax.lax.stop_gradient(0.5 * (log_lo + log_hi))

    # One differentiable Newton step on the detached bisection root.  At the
    # converged root this changes the value below the bisection tolerance but
    # gives EXACT implicit-function gradients d n_e / d(T, N) — the bisection
    # itself is piecewise-constant and would backprop zeros.  This makes the
    # whole pipeline differentiable (spectra w.r.t. atmosphere parameters),
    # which the reference cannot do at all.
    def resid(x):
        return jnp.log(total_charge(x)) - x

    fx, dfx = jax.jvp(resid, (log_ne_star,), (jnp.ones_like(log_ne_star),))
    log_ne = log_ne_star - fx / dfx
    n_e = jnp.exp(log_ne)

    # --- populations ----------------------------------------------------
    frac = _ion_fractions(dt, log_phi_tot, log_ne)  # [E, J, D]
    n_ion = n_elem[dt.slot_element] * frac[dt.slot_element, dt.slot_ion]  # [S, D]

    lb = dt.level_g[:, None] * jnp.exp(
        -beta[None, :] * dt.level_energy[:, None]
    )  # [L, D]
    u = jnp.exp(log_u)
    n_level = n_ion[dt.level_slot] * lb / u[dt.level_slot]

    # --- hydrogen species (reference plasma/base.py:62-127) -------------
    # slots resolved at table-build time; zeroed when H is not in the mix
    # (the reference crashes on ion_number_density.loc[1, 0] instead)
    h_present = dt.has_hydrogen
    n_h_neutral = jnp.where(h_present, n_ion[dt.h_slots[0]], 0.0)
    n_h_plus = jnp.where(h_present, n_ion[dt.h_slots[1]], 0.0)

    lam3 = (THERMAL_DE_BROGLIE_CONST / (M_E_CGS * t)) ** 1.5
    h_minus = n_h_neutral * n_e * (lam3 / 4.0) * jnp.exp(
        H_MINUS_CHI_EV * EV_TO_ERG * beta
    )

    lam3_p = (2.0 * THERMAL_DE_BROGLIE_CONST / (M_P_CGS * t)) ** 1.5
    h2 = n_h_neutral**2 * lam3_p * jnp.exp(
        H2_DISSOCIATION_ENERGY_EV * EV_TO_ERG * beta
    )

    k_h2p = jnp.interp(
        t,
        jnp.asarray(H2_PLUS_K_SAMPLE_TEMPS, dtype=t.dtype),
        jnp.asarray(H2_PLUS_K_EQUILIBRIUM_CONSTANT, dtype=t.dtype),
    )
    h2_plus = n_h_neutral * n_h_plus / k_h2p * 1e-19

    

    return PlasmaState(
        t=t,
        beta=beta,
        log_g_electron=log_g_electron,
        partition_function=u,
        electron_densities=n_e,
        ion_number_density=n_ion,
        level_number_density=n_level,
        number_density=n_elem,
        h_neutral_density=n_h_neutral,
        h_minus_density=h_minus,
        h2_density=h2,
        h2_plus_density=h2_plus,
    )

# ----------------------------------------------------------------------
# reference-parity accessors (TARDIS BasePlasma property names pinned by
# the reference regression suite, tests/test_stardis_regression.py:4-31)
# ----------------------------------------------------------------------

def saha_phi(state: "PlasmaState", dt: DevicePlasmaTables):
    """phi[e, j, d] = 2 (U_{j+1}/U_j) g_electron exp(-beta chi_j) — the
    TARDIS ``phi`` property (n_{j+1} n_e / n_j).  Invalid (e, j) pairs
    (beyond the element's last stage) are 0."""
    log_u = jnp.log(state.partition_function)
    log_phi = _log_phi(dt, log_u, state.beta)
    phi = jnp.exp(log_phi + state.log_g_electron[None, None, :])
    return jnp.where(dt.chi_mask[..., None], phi, 0.0)


def level_boltzmann_factor(state: "PlasmaState", dt: DevicePlasmaTables):
    """g_l exp(-beta E_l) per level per depth — the TARDIS
    ``level_boltzmann_factor``/``general_level_boltzmann_factor`` (equal
    in LTE)."""
    return dt.level_g[:, None] * jnp.exp(
        -state.beta[None, :] * dt.level_energy[:, None]
    )
