"""Planck source function (reference source_functions/blackbody.py:10-35)."""

from __future__ import annotations

import jax.numpy as jnp

from stardis_tpu.constants import C_CGS, H_CGS, K_B_CGS


def blackbody_flux_at_nu(tracing_nus, temps):
    """B_nu(T): [D, N] from nus [N] and temps [D] (or [D, 1])."""
    temps = jnp.asarray(temps)
    if temps.ndim == 1:
        temps = temps[:, None]
    nus = jnp.asarray(tracing_nus)[None, :]
    # f32-safe: nu^3 alone overflows float32 at optical frequencies
    # (9.5e43 > 3.4e38), so fold the 2h/c^2 scale inside the cube
    scale_cbrt = float((2.0 * H_CGS / C_CGS**2) ** (1.0 / 3.0))
    prefactor = (scale_cbrt * nus) ** 3
    return prefactor / jnp.expm1(H_CGS * nus / (K_B_CGS * temps))
