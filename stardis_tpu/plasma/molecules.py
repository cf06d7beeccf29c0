"""Diatomic molecular chemistry (Barklem & Collet 2016 data).

Re-implements reference stardis/plasma/molecules.py TPU-first:

* the K(T) cubic-spline and U_mol(T) linear interpolations depend only on
  the (host-known, static) model temperatures, so they are evaluated on host
  at plan-build time (SciPy), producing dense [molecule, depth] tables;
* the equilibrium number-density solve (closed-form quadratics for
  homonuclear vs heteronuclear pairs, reference molecules.py:106-127) and
  the molecular line alphas run on device from the plasma state.
"""

from __future__ import annotations

import dataclasses
import logging
import re

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from stardis_tpu.constants import (
    ALPHA_COEFFICIENT,
    C_CGS,
    EV_TO_ERG,
    H_CGS,
    K_B_CGS,
)
from stardis_tpu.util.species import element_symbol2atomic_number

logger = logging.getLogger(__name__)

# ideal-gas conversion: K_n [cm^-3] = 10^K_p * Pa / (k_B T)
# (reference molecules.py:97-103; 1 Pa = 10 dyn/cm^2)
PA_TO_CGS = 10.0


def parse_molecular_ion(symbol: str):
    """'H2+' style constituent symbol -> (atomic_number, charge)."""
    m = re.match(r"([A-Z][a-z]?)(\+*)(\-*)$", symbol.strip())
    if not m:
        raise ValueError(f"cannot parse molecular constituent {symbol!r}")
    z = element_symbol2atomic_number(m.group(1))
    charge = len(m.group(2)) - len(m.group(3))
    return z, charge


@dataclasses.dataclass
class MoleculeTables:
    """Host-prepared molecular data for a fixed temperature grid."""

    names: list  # [M]
    ion1_slot: np.ndarray  # [M]
    ion2_slot: np.ndarray  # [M]
    homonuclear: np.ndarray  # [M] bool
    k_density: np.ndarray  # [M, D] number-density equilibrium constant
    partition_function: np.ndarray  # [M, D]
    mass: np.ndarray  # [M] g (sum of constituent masses)
    included: np.ndarray  # [M] bool (False -> zero density)

    @property
    def n_molecules(self):
        return len(self.names)

    def index_of(self, name):
        return self.names.index(name)


def build_molecule_tables(atom_data, tables, temperatures) -> MoleculeTables:
    """Interpolate B&C2016 K(T) and U(T) onto the model temperature grid."""
    from scipy.interpolate import CubicSpline

    md = atom_data.molecule_data
    if md is None:
        raise ValueError(
            "No molecular data in atomic data. Provide Barklem & Collet 2016 "
            "tables (equilibrium constants, partition functions, "
            "dissociation energies)."
        )
    temps = np.asarray(temperatures, dtype=float)
    eq = md.equilibrium_constants
    sample_temps = eq.columns.values.astype(float)

    names, i1, i2, homo, kk, uu, mass, included = [], [], [], [], [], [], [], []
    masses_by_z = atom_data.atom_data.mass

    for molecule in eq.index:
        row = md.dissociation_energies.loc[molecule]
        names.append(molecule)
        ok = True
        z1 = c1 = z2 = c2 = 0
        try:
            z1, c1 = parse_molecular_ion(row.Ion1)
            z2, c2 = parse_molecular_ion(row.Ion2)
        except ValueError:
            ok = False
        if ok and (c1 == -1 or c2 == -1):
            logger.warning(
                "Negative ionic molecules not supported. Assuming no %s.",
                molecule,
            )
            ok = False
        slot1 = slot2 = 0
        if ok:
            try:
                slot1 = tables.slot_of(z1, c1)
                slot2 = tables.slot_of(z2, c2)
            except KeyError:
                logger.warning(
                    "Constituents of %s not in included elements; assuming "
                    "no %s.", molecule, molecule,
                )
                ok = False

        spline = CubicSpline(
            sample_temps, eq.loc[molecule].values, extrapolate=True
        )
        log_kp = spline(temps)
        k_n = (10.0**log_kp) * PA_TO_CGS / (K_B_CGS * temps)

        u_mol = np.interp(
            temps,
            md.partition_functions.columns.values.astype(float),
            md.partition_functions.loc[molecule].values,
        )

        i1.append(slot1)
        i2.append(slot2)
        homo.append(ok and (z1 == z2 and c1 == c2))
        kk.append(k_n)
        uu.append(u_mol)
        m1 = masses_by_z.loc[z1] if ok else 0.0
        m2 = masses_by_z.loc[z2] if ok else 0.0
        mass.append(m1 + m2)
        included.append(ok)

    return MoleculeTables(
        names=names,
        ion1_slot=np.asarray(i1, dtype=np.int64),
        ion2_slot=np.asarray(i2, dtype=np.int64),
        homonuclear=np.asarray(homo, dtype=bool),
        k_density=np.asarray(kk),
        partition_function=np.asarray(uu),
        mass=np.asarray(mass),
        included=np.asarray(included, dtype=bool),
    )


def molecule_number_density(mt: MoleculeTables, state, dtype=None):
    """[M, D] molecular number densities (reference molecules.py:106-127).

    Homonuclear AA: 2 n_AA + n_A = N_A  with n_A^2 = k n_AA
      -> n_AA = (1/8)(k + 4 N - sqrt(k (k + 8 N)))
    Heteronuclear AB: n_A n_B = k n_AB with conservation
      -> n_AB = 0.5 (k + N_A + N_B - sqrt(k^2 + 2k(N_A+N_B) + (N_A-N_B)^2))

    Both quadratic roots are evaluated in the conjugate form
    (n_AA = 2 N^2 / (k + 4N + sqrt(k(k+8N))),
     n_AB = 2 N_A N_B / (k + N_A + N_B + sqrt(...)))
    because the textbook difference form cancels catastrophically once
    n_mol/N < machine-eps^(1/2): k >> N makes (k+4N) - sqrt(k(k+8N))
    ~ 8N^2/k, a relative-(N/k)^2 residue that rounds to ZERO for mostly
    dissociated molecules (O2 at 10^4 K dies even in f64; in the f32
    device pipeline anything below n_mol/N ~ 1e-4 dies).  The conjugate
    form is algebraically identical and stable at all k.

    The discriminants are additionally evaluated scale-factored by
    s = k + (constituent sum): k*(k+8N) and k^2 overflow f32 (k reaches
    ~1e22 at 10^4 K; f32 max is 3.4e38), while every factored term is
    O(max(k, N)).
    """
    n1 = state.ion_number_density[jnp.asarray(mt.ion1_slot)]  # [M, D]
    n2 = state.ion_number_density[jnp.asarray(mt.ion2_slot)]
    k = jnp.asarray(mt.k_density, dtype=dtype or n1.dtype)
    homo = jnp.asarray(mt.homonuclear)[:, None]
    included = jnp.asarray(mt.included)[:, None]

    s_aa = k + 4.0 * n1
    root_aa = jnp.sqrt((k / s_aa) * ((k + 8.0 * n1) / s_aa))
    n_homo = 2.0 * (n1 / s_aa) * n1 / (root_aa + 1.0)

    s_ab = k + n1 + n2
    disc = (k / s_ab) ** 2 + 2.0 * (k / s_ab) * ((n1 + n2) / s_ab) + (
        (n1 - n2) / s_ab
    ) ** 2
    n_hetero = 2.0 * (n1 / s_ab) * n2 / (jnp.sqrt(disc) + 1.0)

    n_mol = jnp.where(homo, n_homo, n_hetero)
    n_mol = jnp.maximum(n_mol, 0.0)
    return jnp.where(included, n_mol, 0.0)


def molecule_number_density_coupled(
    mt: MoleculeTables, state, n_iter: int = 400, damping: float = 0.5,
    dtype=None, return_aux: bool = False,
):
    """[M, D] molecular densities from the COUPLED network (extension).

    The reference (molecules.py:106-127) — and ``molecule_number_density``
    above, which mirrors it — solves each molecule's quadratic
    independently against the full atomic reservoirs, so molecules
    sharing a constituent over-consume it: below ~4000 K CO locks up
    nearly all free carbon, yet the independent solve still hands that
    same carbon to C2/CH/CN, inflating them by orders of magnitude
    (measured against Korg.jl, which solves the coupled network:
    tests/test_korg_parity.py).

    This opt-in solver couples them: find per-constituent-slot depletion
    factors x_s in (0, 1] with free densities n_s = x_s N_s such that

        N_s = n_s + sum_m nu_{s,m} n_m,   n_m = n_A n_B / k_m
        (homonuclear: n_m = n_A^2 / k_m, nu = 2)

    via a damped exact-per-slot Jacobi sweep: holding the other slots
    fixed, slot s's own conservation is the quadratic
    N_s = n_s + 2 alpha_s n_s^2 + beta_s n_s with
    alpha_s = sum_{homo m} 1/k_m and beta_s = sum_{hetero m} n_other/k_m,
    whose stable root is x_s = 2 / (1 + beta_s + sqrt((1+beta_s)^2 +
    8 alpha_s N_s)) — exact in one step for a single homonuclear
    molecule (H2-dominated M-dwarf conditions), so the outer loop only
    has to relax the CROSS-molecule coupling.  A jit/grad-friendly
    ``lax.fori_loop`` with a static trip count; 400 damped iterations
    converge to ~1e-11 even in the stiffest case found (2500 K, rho
    1e-5: 98%-molecular hydrogen with CO consuming nearly all C and O —
    the cross-reservoir C<->O relaxation is the slow mode).
    Ionization stays fixed at the LTE solution (molecular electron
    donation is negligible for these species), so each (z, charge)
    reservoir depletes independently — the same level of approximation
    Barklem & Collet-style chemistry uses.

    For a molecule whose constituents appear in no OTHER molecule the
    result equals the pairwise quadratic exactly.
    """
    n_res = state.ion_number_density  # [S, D] undepleted reservoirs
    if dtype is not None:
        n_res = n_res.astype(dtype)
    k = jnp.asarray(mt.k_density, dtype=n_res.dtype)  # [M, D]
    i1 = jnp.asarray(mt.ion1_slot)
    i2 = jnp.asarray(mt.ion2_slot)
    homo = jnp.asarray(mt.homonuclear)[:, None]
    included = jnp.asarray(mt.included)[:, None]
    n_slots = n_res.shape[0]

    def _n_mol(x):
        n1 = x[i1] * n_res[i1]
        n2 = x[i2] * n_res[i2]
        # (n1/k)*n2 keeps intermediates at O(max) — n1*n2 overflows f32
        n_m = jnp.where(homo, (n1 / k) * n1, (n1 / k) * n2)
        return jnp.where(included, n_m, 0.0), n1, n2

    def body(_, x):
        # alpha/beta are division-free in the state (only 1/k and n/k),
        # keeping the map smooth for jax.grad even where a reservoir is 0.
        n1 = x[i1] * n_res[i1]
        n2 = x[i2] * n_res[i2]
        zero = jnp.zeros_like(n1)
        alpha = jnp.zeros_like(n_res)
        alpha = alpha.at[i1].add(jnp.where(included & homo, 1.0 / k, zero))
        beta = jnp.zeros_like(n_res)
        beta = beta.at[i1].add(jnp.where(included & ~homo, n2 / k, zero))
        beta = beta.at[i2].add(jnp.where(included & ~homo, n1 / k, zero))
        b1 = 1.0 + beta
        x_new = 2.0 / (b1 + jnp.sqrt(b1 * b1 + 8.0 * alpha * n_res))
        return (1.0 - damping) * x + damping * x_new

    x = jax.lax.fori_loop(
        0, n_iter, body, jnp.ones((n_slots,) + n_res.shape[1:], n_res.dtype)
    )
    n_m, _, _ = _n_mol(x)
    n_m = jnp.maximum(n_m, 0.0)
    if return_aux:
        return n_m, x
    return n_m


def coupled_network_residual(mt: MoleculeTables, state, x, n_m, dtype=None):
    """Convergence diagnostic for the coupled solver: the worst relative
    violation of per-slot conservation
    N_s = x_s N_s + sum_m nu_{s,m} n_m over slots that participate in any
    included molecule (``x`` and ``n_m`` from
    molecule_number_density_coupled(return_aux=True)).  ~1e-11 in the
    validated envelope (2500-10000 K, rho <= 1e-5 g/cm^3 — the regimes
    pinned by tests/test_korg_parity.py); a large value means the fixed
    400-iteration Jacobi sweep left the run's regime unconverged."""
    n_res = state.ion_number_density
    if dtype is not None:
        n_res = n_res.astype(dtype)
    i1 = jnp.asarray(mt.ion1_slot)
    i2 = jnp.asarray(mt.ion2_slot)
    homo = jnp.asarray(mt.homonuclear)[:, None]
    included = jnp.asarray(mt.included)[:, None]
    nu_m = jnp.where(included, jnp.asarray(n_m, n_res.dtype), 0.0)
    consumed = jnp.zeros_like(n_res)
    consumed = consumed.at[i1].add(jnp.where(homo, 2.0 * nu_m, nu_m))
    consumed = consumed.at[i2].add(jnp.where(homo, 0.0, nu_m))
    participates = jnp.zeros(n_res.shape[0], bool)
    live = jnp.asarray(mt.included)
    participates = participates.at[i1].max(live)
    participates = participates.at[i2].max(live)
    resid = jnp.abs(n_res - jnp.asarray(x, n_res.dtype) * n_res - consumed)
    resid = resid / jnp.maximum(n_res, 1e-300)
    return jnp.max(jnp.where(participates[:, None], resid, 0.0))


def molecule_number_density_frame(mt: MoleculeTables, state, coupled=False,
                                  columns=None):
    """Reference-shaped convenience: the notebook surface
    ``stellar_plasma.molecule_number_density`` is a DataFrame indexed by
    molecule name over depth points (reference molecules.py:138-141 /
    docs/creating_simple_models/flexible_plasma.ipynb).  ``coupled=True``
    uses the coupled-network solver.  ``columns`` labels the depth axis
    (the reference carries ion_number_density.columns, reference
    molecules.py:133-137); defaults to a 0..D-1 "depth_point" index."""
    if coupled:
        n_m, x = molecule_number_density_coupled(mt, state, return_aux=True)
        values = np.asarray(n_m)
        resid = float(coupled_network_residual(mt, state, x, n_m))
        if resid > 1e-6:
            import warnings

            warnings.warn(
                "coupled molecular network left a conservation residual of "
                f"{resid:.2e} (> 1e-6): this atmosphere is outside the "
                "validated envelope (2500-10000 K, rho <= 1e-5 g/cm^3) — "
                "densities may be unconverged",
                stacklevel=2,
            )
    else:
        values = np.asarray(molecule_number_density(mt, state))
    if columns is None:
        columns = pd.RangeIndex(values.shape[1], name="depth_point")
    return pd.DataFrame(
        values,
        index=pd.Index(mt.names, name="molecule"),
        columns=columns,
    )


@dataclasses.dataclass
class MoleculeLineData:
    """Host-prepared molecular lines in the tracing window (VALD-style)."""

    nu: np.ndarray  # [L]
    molecule_index: np.ndarray  # [L] row into MoleculeTables
    gf: np.ndarray  # [L] 10^log_gf
    e_low_erg: np.ndarray  # [L]
    e_up_erg: np.ndarray  # [L]
    A_ul: np.ndarray  # [L]
    stark: np.ndarray  # [L]
    waals: np.ndarray  # [L]
    mass: np.ndarray  # [L] molecule mass [g]

    @property
    def n_lines(self):
        return len(self.nu)


def prepare_molecule_line_data(
    atom_data, mt: MoleculeTables, nu_min, nu_max
) -> MoleculeLineData:
    ll = atom_data.linelist_molecules
    if ll is None:
        raise ValueError("atom data has no linelist_molecules")
    ll = ll.copy()
    nu = C_CGS / (ll.wavelength.values * 1e-8)
    ll["nu"] = nu
    if "e_up" not in ll.columns:
        ll["e_up"] = ll.e_low.values + (
            H_CGS * C_CGS / (ll.wavelength.values * 1e-8)
        ) / EV_TO_ERG
    ll = ll.sort_values("nu")
    ll = ll[(ll.nu >= nu_min) & (ll.nu <= nu_max)]

    index_map = {name: i for i, name in enumerate(mt.names)}
    mol_index = np.array(
        [index_map.get(m, -1) for m in ll.molecule.values], dtype=np.int64
    )
    # drop lines of unknown or excluded molecules ("assume no <molecule>",
    # matching the density handling): their mass would be 0 -> inf Doppler
    keep = (mol_index >= 0) & mt.included[np.maximum(mol_index, 0)]
    if not keep.all():
        logger.warning(
            "Dropping %d molecular lines of excluded/unknown molecules",
            int((~keep).sum()),
        )
    ll = ll[keep]
    mol_index = mol_index[keep]
    return MoleculeLineData(
        nu=ll.nu.values.astype(float),
        molecule_index=mol_index,
        gf=(10.0 ** ll.log_gf.values).astype(float),
        e_low_erg=(ll.e_low.values * EV_TO_ERG).astype(float),
        e_up_erg=(ll.e_up.values * EV_TO_ERG).astype(float),
        A_ul=(10.0 ** ll.rad.values).astype(float),
        stark=ll.stark.values.astype(float),
        waals=ll.waals.values.astype(float),
        mass=mt.mass[mol_index],
    )


def compute_molecule_line_quantities(
    mld: MoleculeLineData,
    mt: MoleculeTables,
    state,
    temperatures,
    microturbulence_cgs,
    broadening_flags,
    dtype=None,
    coupled: bool = False,
):
    """(alpha, gamma, doppler) [L, D] for molecular lines.

    alpha follows AlphaLineValdMolecule (reference molecules.py:192-319);
    gamma follows calculate_molecule_broadening with VALD parameters
    (reference broadening.py:735-821); Doppler widths use the molecule mass
    (sum of constituent masses, broadening.py:808-819).
    """
    from stardis_tpu.opacities.broadening import (
        calc_doppler_width,
        calc_vald_stark_gamma,
    )

    t = temperatures
    density_fn = (
        molecule_number_density_coupled if coupled else molecule_number_density
    )
    n_mol = density_fn(mt, state, dtype=dtype)  # [M, D]
    u_mol = jnp.asarray(mt.partition_function, dtype=dtype)
    n_over_u = n_mol / u_mol  # [M, D]

    idx = jnp.asarray(mld.molecule_index)
    nu = jnp.asarray(mld.nu, dtype=dtype)[:, None]
    boltz = jnp.exp(
        -jnp.asarray(mld.e_low_erg, dtype=dtype)[:, None] * state.beta[None, :]
    )
    stim = 1.0 - jnp.exp(-H_CGS * nu / (K_B_CGS * t[None, :]))
    alpha = (
        ALPHA_COEFFICIENT
        * jnp.asarray(mld.gf, dtype=dtype)[:, None]
        * n_over_u[idx]
        * boltz
        * stim
    )

    gamma = jnp.zeros_like(alpha)
    if "radiation" in broadening_flags:
        gamma = gamma + jnp.asarray(mld.A_ul, dtype=dtype)[:, None]
    if (
        "linear_stark" in broadening_flags
        or "quadratic_stark" in broadening_flags
    ):
        gamma = gamma + calc_vald_stark_gamma(
            state.electron_densities[None, :],
            jnp.asarray(mld.stark, dtype=dtype)[:, None],
            t[None, :],
        )
    # van-der-Waals for molecules needs the Unsoeld path's n_eff, which is
    # undefined for molecular levels; like the reference we only apply the
    # scaled 10^vdW law when the packed parameter is negative
    if "van_der_waals" in broadening_flags:
        vdw = jnp.asarray(mld.waals, dtype=dtype)[:, None]
        h1 = state.h_neutral_density
        scaled = 10.0**vdw * (t[None, :] / 1e4) ** 0.38 * h1[None, :]
        gamma = gamma + jnp.where(vdw < 0, scaled, 0.0)

    doppler = calc_doppler_width(
        nu, t[None, :], jnp.asarray(mld.mass, dtype=dtype)[:, None],
        microturbulence_cgs,
    )
    return alpha, gamma, doppler
