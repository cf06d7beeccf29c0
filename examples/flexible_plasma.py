"""Custom-model plasma exploration + Korg cross-check.

Mirrors the reference's docs/creating_simple_models/flexible_plasma.ipynb:
build a model, override its temperature/density structure by hand, solve
the plasma + molecular chemistry, and compare the molecular number
densities against Korg.jl's (the independent-code oracle shipped with the
reference docs and vendored at tests/data/korg_number_densities.csv).

Run from a checkout:  python examples/flexible_plasma.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from stardis_tpu.atom_data import build_builtin_atom_data  # noqa: E402
from stardis_tpu.io.abundances import create_scaled_solar_profile  # noqa: E402
from stardis_tpu.plasma import (  # noqa: E402
    build_plasma_tables,
    device_tables,
    solve_lte,
)
from stardis_tpu.plasma.molecules import (  # noqa: E402
    build_molecule_tables,
    molecule_number_density_frame,
)

# --- a hand-built model: linear 3000-10000 K, uniform photospheric rho ---
atom_data = build_builtin_atom_data(max_atomic_number=30, include_molecules=True)
mass_frac = create_scaled_solar_profile(
    atom_data, final_atomic_number=30, composition_source="asplund_2020"
)
temperatures = np.linspace(3000.0, 10000.0, 56)
rho = 3e-7  # g/cm^3, reasonable just above the solar photosphere
masses = atom_data.atom_data.mass
n_elem = pd.DataFrame(
    (rho * mass_frac.values / masses.loc[mass_frac.index].values[:, None])
    * np.ones((1, temperatures.size)),
    index=mass_frac.index,
)

# --- solve LTE ionization + molecular equilibrium --------------------------
tables = build_plasma_tables(atom_data, n_elem.index.values)
state = solve_lte(
    jnp.asarray(temperatures),
    jnp.asarray(n_elem.loc[tables.zs].values),
    device_tables(tables),
)
mol_tables = build_molecule_tables(atom_data, tables, temperatures)
n_mol = molecule_number_density_frame(mol_tables, state)

print("molecule number densities [cm^-3] at selected temperatures:")
cols = [0, 14, 28, 42, 55]
header = "  ".join(f"{temperatures[c]:9.0f}K" for c in cols)
print(f"{'':6s}{header}")
for name in n_mol.index:
    row = "  ".join(f"{n_mol.loc[name].values[c]:10.3e}" for c in cols)
    print(f"{name:6s}{row}")

# --- compare with Korg ------------------------------------------------------
korg_csv = Path(__file__).parent.parent / "tests/data/korg_number_densities.csv"
korg = pd.read_csv(korg_csv)
n_coup = molecule_number_density_frame(mol_tables, state, coupled=True)
print("\nvs Korg.jl (independent code) — max |rel diff| over all 56 temps:")
print(f"  {'':4s} {'independent (ref parity)':>26s} {'coupled network':>17s}")
for ours, col in [("H2", "H2"), ("H2+", "HHplus"), ("O2", "O2"), ("C2", "C2")]:
    fp = np.abs(n_mol.loc[ours].values / korg[col].values - 1.0).max()
    fc = np.abs(n_coup.loc[ours].values / korg[col].values - 1.0).max()
    print(f"  {ours:4s} {fp:26.3g} {fc:17.3g}")
print(
    "\nC2/O2 diverge at low T under the reference-parity independent\n"
    "quadratics because CO locks up free carbon there; the opt-in coupled\n"
    "solver (opacity.line.molecules_coupled) depletes shared reservoirs\n"
    "consistently and lands within a factor ~2-5 of Korg everywhere; see\n"
    "tests/test_korg_parity.py."
)
