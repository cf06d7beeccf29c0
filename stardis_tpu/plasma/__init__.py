from stardis_tpu.plasma.lte import (
    DevicePlasmaTables,
    PlasmaState,
    device_tables,
    solve_lte,
)
from stardis_tpu.plasma.tables import PlasmaTables, build_plasma_tables


def create_stellar_plasma(stellar_model, atom_data, config=None):
    """Reference-shaped convenience wrapper (reference plasma/base.py:491):
    builds the plasma tables for a stellar model and solves the LTE state at
    its temperatures, returning (PlasmaState, PlasmaTables)."""
    import jax.numpy as jnp
    import numpy as np

    n_elem_frame = stellar_model.composition.elemental_number_density
    tables = build_plasma_tables(atom_data, n_elem_frame.index.values)
    dt = device_tables(tables)
    state = solve_lte(
        jnp.asarray(np.asarray(stellar_model.temperatures)),
        jnp.asarray(n_elem_frame.loc[tables.zs].values),
        dt,
    )
    return state, tables


__all__ = [
    "DevicePlasmaTables",
    "PlasmaState",
    "PlasmaTables",
    "build_plasma_tables",
    "create_stellar_plasma",
    "device_tables",
    "solve_lte",
]
