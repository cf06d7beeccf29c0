"""Reference-shaped radiation-field module surface
(reference stardis/radiation_field/base.py).

`RadiationField` lives in stardis_tpu.base alongside STARDISOutput;
`create_stellar_radiation_field` mirrors the reference's convenience entry
point (radiation_field/base.py:71-117) on top of the plan/stage pipeline.
"""

from __future__ import annotations

import numpy as np

from stardis_tpu.base import Opacities, RadiationField
from stardis_tpu.radiation_field.solver import gauss_legendre_thetas

__all__ = ["Opacities", "RadiationField", "create_stellar_radiation_field"]


def create_stellar_radiation_field(tracing_nus, stellar_model, atom_data, config):
    """Build opacities and raytrace for a prepared stellar model.

    Unlike the reference (which takes a solved plasma), this runs the full
    device pipeline (plasma + opacities + transfer) and returns the
    populated RadiationField.
    """
    from stardis_tpu.pipeline import build_simulation_plan, run_simulation

    nus = np.atleast_1d(np.asarray(tracing_nus))
    plan = build_simulation_plan(config, atom_data, stellar_model, nus)
    f_nu, total, opacities_dict, i_nus, state, _ = run_simulation(plan)

    # the pipeline computes on a descending grid; re-align every nu-axis
    # output with the caller's ordering (reference contract: outputs follow
    # the input tracing_nus)
    order = np.argsort(np.argsort(-nus, kind="stable"), kind="stable")
    f_nu = np.asarray(f_nu)[:, order]
    total = np.asarray(total)[:, order]
    opacities_dict = {
        k: (np.asarray(v)[:, order] if np.ndim(v) == 2
            and np.shape(v)[1] == len(nus) else v)
        for k, v in opacities_dict.items()
    }
    if i_nus is not None:
        i_nus = np.asarray(i_nus)[:, order, :]

    thetas, weights = gauss_legendre_thetas(int(config.no_of_thetas))
    return RadiationField(
        frequencies=nus,
        opacities=Opacities(opacities_dict, total),
        f_nu=f_nu,
        thetas=thetas,
        weights=weights,
        i_nus=i_nus,
    )
