"""Formal solution of the radiative-transfer equation (JAX).

Implements van Noort 2001 eq. 14 short characteristics with parabolic source
interpolation, matching reference radiation_field_solvers/base.py:6-381:

* segment optical depth tau = exp((ln a_k + ln a_{k+1})/2) * ds  (log-space
  midpoint opacity, reference base.py:121);
* weights w0/w1/w2 with the reference's three tau regimes (Taylor branch
  below 5e-4, saturation above 50; base.py:6-47), evaluated branchlessly;
* the depth sweep I_{k+1} = a_k I_k + b_k is a *first-order linear
  recurrence*, so it runs as jax.lax.associative_scan over depth —
  O(log n_depth) wall-clock on TPU instead of the reference's serial loop —
  vmapped over theta; frequencies vectorize on the VPU lanes;
* spherical geometry adds the preliminary inward sweep (surface -> center,
  base.py:141-198) including the reference's wrap-around indexing of
  taus[gap-1] at gap 0, and the photospheric flux correction
  (r_outer/r_ref)^2 (base.py:340-344).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TAU_TAYLOR = 5e-4
TAU_SATURATED = 50.0


def gauss_legendre_thetas(num_of_thetas):
    """Reference theta quadrature (radiation_field/base.py:61-63):
    thetas = x/2 + pi/4, weights = w * pi/2.  (Note: this weights the
    quadrature so an isotropic intensity I integrates to F = pi * I.)"""
    x, w = np.polynomial.legendre.leggauss(num_of_thetas)
    thetas = x / 2.0 + 0.5 * np.pi / 2.0
    weights = w * np.pi / 2.0
    return thetas, weights


def calc_weights(delta_tau):
    """w0, w1, w2 with three tau regimes (reference base.py:6-82)."""
    tau = delta_tau
    exp_tau = jnp.exp(-jnp.clip(tau, max=TAU_SATURATED + 10.0))

    w0_mid = 1.0 - exp_tau
    w1_mid = w0_mid - tau * exp_tau
    w2_mid = 2.0 * w1_mid - tau * tau * exp_tau

    w0_small = tau * (1.0 - tau / 2.0)
    w1_small = tau**2 * (0.5 - tau / 3.0)
    w2_small = tau**3 * (1.0 / 3.0 - tau / 4.0)

    small = tau < TAU_TAYLOR
    big = tau >= TAU_SATURATED  # reference: elif tau < 50, else saturated
    w0 = jnp.where(small, w0_small, jnp.where(big, 1.0, w0_mid))
    w1 = jnp.where(small, w1_small, jnp.where(big, 1.0, w1_mid))
    w2 = jnp.where(small, w2_small, jnp.where(big, 2.0, w2_mid))
    return w0, w1, w2


def _linear_recurrence(a, b, x0):
    """x_{k+1} = a_k x_k + b_k via associative scan; returns [K+1, ...]
    including x0."""

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    a_cum, b_cum = jax.lax.associative_scan(combine, (a, b), axis=0)
    xs = a_cum * x0[None] + b_cum
    return jnp.concatenate([x0[None], xs], axis=0)


def _safe(tau):
    return jnp.where(tau == 0.0, 1.0, tau)


def single_theta_trace(source, taus, inward_rays=False):
    """Intensity at every depth point for one ray angle.

    Parameters
    ----------
    source : [D, N] source function (D = G + 1)
    taus : [G, N] segment optical depths (path lengths already folded in)
    inward_rays : spherical chords get a surface->center sweep first

    Returns
    -------
    I : [D, N]
    """
    n_gaps = taus.shape[0]
    w0, w1, w2 = calc_weights(taus)

    s = source  # [G+1, N]

    i_inner = jnp.zeros_like(s[0])
    if inward_rays:
        # inward sweep: I[g] = a'_g I[g+1] + b'_g for g = G-1 .. 0, with the
        # reference's wrap-around tau[g-1]/source[g-1] at g = 0
        tau_g = taus  # [G, N]
        tau_gm1 = jnp.roll(taus, 1, axis=0)  # tau[g-1], wraps at 0
        # source[g-1] with the reference's wrap: at g=0 it reads the FULL
        # array's last element s[G] (numpy negative indexing at
        # reference base.py:145-190), not s[G-1]
        s_gm1 = jnp.roll(s, 1, axis=0)[:-1]
        s_g = s[:-1]
        s_gp1 = s[1:]

        denom = tau_g + tau_gm1
        second = (
            w1
            * (
                (s_g - s_gm1) * (tau_g / _safe(tau_gm1))
                - (s_g - s_gp1) * (tau_gm1 / _safe(tau_g))
            )
            / _safe(denom)
        )
        third = (
            w2
            * (
                (s_gm1 - s_g) / _safe(tau_gm1)
                + (s_gp1 - s_g) / _safe(tau_g)
            )
            / _safe(denom)
        )
        zero = (tau_g == 0.0) | (tau_gm1 == 0.0)
        a_in = jnp.where(zero, 1.0, 1.0 - w0)
        b_in = jnp.where(zero, 0.0, w0 * s_g + second + third)
        # recurrence runs from the surface down: reverse the gap axis
        i_down = _linear_recurrence(
            a_in[::-1], b_in[::-1], jnp.zeros_like(s[0])
        )  # index m: I at gap G-m going down; last entry is I[gap 0]
        i_inner = i_down[-1]

    # outward sweep: gaps 0 .. G-2 use the parabolic interior formula;
    # the last gap uses the constant-source boundary jump (base.py:251-266)
    tau_k = taus[: n_gaps - 1]
    tau_kp1 = taus[1:n_gaps]
    s_k = s[: n_gaps - 1]
    s_kp1 = s[1:n_gaps]
    s_kp2 = s[2 : n_gaps + 1]
    w0_i, w1_i, w2_i = w0[: n_gaps - 1], w1[: n_gaps - 1], w2[: n_gaps - 1]

    denom = tau_k + tau_kp1
    second = (
        w1_i
        * (
            (s_kp1 - s_kp2) * (tau_k / _safe(tau_kp1))
            - (s_kp1 - s_k) * (tau_kp1 / _safe(tau_k))
        )
        / _safe(denom)
    )
    third = (
        w2_i
        * ((s_kp2 - s_kp1) / _safe(tau_kp1) + (s_k - s_kp1) / _safe(tau_k))
        / _safe(denom)
    )
    zero_i = tau_k == 0.0
    a_interior = jnp.where(zero_i, 1.0, 1.0 - w0_i)
    b_interior = jnp.where(zero_i, 0.0, w0_i * s_kp1 + second + third)

    tau_last = taus[-1]
    zero_l = tau_last == 0.0
    third_last = w2[-1] * (s[-2] - s[-1]) / _safe(tau_last) ** 2
    a_last = jnp.where(zero_l, 1.0, 1.0 - w0[-1])
    b_last = jnp.where(zero_l, 0.0, w0[-1] * s[-1] + third_last)

    a = jnp.concatenate([a_interior, a_last[None]], axis=0)  # [G, N]
    b = jnp.concatenate([b_interior, b_last[None]], axis=0)
    return _linear_recurrence(a, b, i_inner)  # [D, N]


def compute_taus(alphas, ray_dist):
    """tau[g, n] = exp(mean(ln alpha)) * ds_g (reference base.py:119-129).

    ray_dist may be [G] (plane-parallel single angle) or scalar-broadcastable.
    Zero distances (spherical rays missing inner shells) give tau = 0.
    """
    mean_alphas = jnp.exp(
        0.5 * (jnp.log(alphas[1:]) + jnp.log(alphas[:-1]))
    )  # [G, N]
    return mean_alphas * ray_dist[:, None]


def raytrace(
    alphas,  # [D, N] total extinction
    source,  # [D, N]
    ray_distances,  # [G, T] per-gap path lengths for each theta
    weights,  # [T]
    inward_rays=False,
    photospheric_correction=None,
    track_individual_intensities=False,
):
    """F_nu [D, N] = sum_theta w_theta I_theta (reference base.py:271-346)."""

    def one_theta(dist):
        taus = compute_taus(alphas, dist)
        return single_theta_trace(source, taus, inward_rays=inward_rays)

    i_nus = jax.vmap(one_theta, in_axes=1, out_axes=0)(ray_distances)  # [T, D, N]
    f_nu = jnp.tensordot(jnp.asarray(weights, dtype=i_nus.dtype), i_nus, axes=1)
    if photospheric_correction is not None:
        f_nu = f_nu * photospheric_correction
    if track_individual_intensities:
        return f_nu, jnp.moveaxis(i_nus, 0, -1)  # [D, N, T]
    return f_nu, None


def calculate_spherical_ray(thetas, depth_points_radii):
    """Chord lengths through shells per impact parameter (host-side NumPy;
    reference base.py:349-381)."""
    radii = np.asarray(depth_points_radii)
    out = np.zeros((len(radii) - 1, len(thetas)))
    for ti, theta in enumerate(np.asarray(thetas)):
        b = radii[-1] * np.sin(theta)
        with np.errstate(invalid="ignore"):
            z = np.sqrt(radii**2 - b**2)  # NaN where the ray misses the shell
        dz = np.diff(z)
        good = ~np.isnan(dz)
        out[good, ti] = dz[good]
    return out
