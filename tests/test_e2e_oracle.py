"""End-to-end NumPy oracle: a literal scalar-loop transcription of the
reference's calc_alphas (opacities_solvers/base.py:630-740) and raytrace
(radiation_field_solvers/base.py:85-346) compared against the full device
pipeline at 1e-8.

Unit tests pin each kernel in isolation; this catches CROSS-STAGE
convention bugs — the descending-nu grid, the gamma/(sqrt(pi)pi) Voigt
convention, stimulated emission, the log-midpoint tau, the 3-regime
weights, the constant-source boundary jump — by recomputing the whole
chain independently.  The plasma state is taken as input (it has its own
analytic oracle in test_plasma.py).
"""

import os
import tempfile

import numpy as np
import pytest

jax = pytest.importorskip("jax")
yaml = pytest.importorskip("yaml")
from scipy.special import wofz  # noqa: E402

from stardis_tpu import parse_config_to_model, units as u
from stardis_tpu.constants import (
    ALPHA_COEFFICIENT,
    BF_CONSTANT,
    C_CGS,
    FF_CONSTANT,
    H_CGS,
    K_B_CGS,
    RYDBERG_ENERGY,
    RYDBERG_FREQUENCY,
    SIGMA_T_CGS,
)
from stardis_tpu.io.synthetic import write_marcs_file
from stardis_tpu.pipeline import build_simulation_plan, run_simulation


@pytest.fixture(scope="module")
def small_run():
    tmpdir = tempfile.mkdtemp(prefix="stardis_oracle_")
    model_path = os.path.join(tmpdir, "sun.mod")
    write_marcs_file(model_path)
    config = {
        "stardis_config_version": 1.0,
        "atom_data": "builtin:2",
        "input_model": {
            "type": "marcs",
            "fname": model_path,
            "final_atomic_number": 2,
        },
        "opacity": {
            "bf": {"H_I": {}},
            "ff": {"H_I": {}},
            "rayleigh": ["H"],
            "disable_electron_scattering": False,
            "line": {
                "disable": False,
                "broadening": [
                    "radiation",
                    "linear_stark",
                    "quadratic_stark",
                    "van_der_waals",
                ],
            },
        },
        "no_of_thetas": 5,
        "result_options": {},
    }
    cfg_path = os.path.join(tmpdir, "c.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(config, fh)
    config, adata, model = parse_config_to_model(cfg_path)
    lams = np.arange(6540.0, 6590.0, 0.2)  # 250 points around H-alpha
    nus = np.asarray(u.Quantity(lams, u.AA).to(u.Hz, u.spectral()))
    plan = build_simulation_plan(config, adata, model, nus)
    f_nu, total, opacities, i_nus, state, window = run_simulation(plan)
    return plan, state, np.asarray(f_nu), np.asarray(total), {
        k: np.asarray(v) for k, v in opacities.items()
    }


# ---------------------------------------------------------------------
# oracle pieces (literal reference transcriptions, scalar loops)
# ---------------------------------------------------------------------

def oracle_continuum(plan, st):
    nus = plan.tracing_nus  # [N] descending
    t = np.asarray(st.t)
    n_e = np.asarray(st.electron_densities)
    n_level = np.asarray(st.level_number_density)
    n_ion = np.asarray(st.ion_number_density)
    tb = plan.tables
    n_depth, n_nu = len(t), len(nus)

    # hydrogenic bound-free (reference base.py:178-271)
    alpha_bf = np.zeros((n_depth, n_nu))
    bf = plan.bf
    for k in range(len(bf.level_flat)):
        cutoff = bf.cutoff_frequencies[k]
        z = bf.ion_numbers[k] + 1.0
        n_eff = z * np.sqrt(RYDBERG_FREQUENCY / cutoff)
        n_l = n_level[bf.level_flat[k]]  # [D]
        for n in range(n_nu):
            if nus[n] < cutoff:
                continue
            alpha_bf[:, n] += (
                BF_CONSTANT * z**4 * n_l / n_eff**5 / nus[n] ** 3
            )

    # hydrogenic free-free (reference base.py:274-317)
    alpha_ff = np.zeros((n_depth, n_nu))
    for m, slot in enumerate(plan.ff_slots):
        z = plan.ff_ion_numbers[m]
        contrib = FF_CONSTANT * z**2 * n_ion[slot] * n_e / np.sqrt(t)  # [D]
        alpha_ff += contrib[:, None] / nus[None, :] ** 3

    # Rayleigh H (reference base.py:74-135)
    c4, c6, c8 = 20.24, 239.2, 2256.0
    n_h1 = n_ion[tb.slot_of(1, 0)]
    rel = np.where(nus > 2.3e15, 0.0, nus) / (2.0 * RYDBERG_FREQUENCY)
    alpha_ray = (
        SIGMA_T_CGS
        * n_h1[:, None]
        * (c4 * rel**4 + c6 * rel**6 + c8 * rel**8)[None, :]
    )

    alpha_e = np.broadcast_to((SIGMA_T_CGS * n_e)[:, None], (n_depth, n_nu))
    return alpha_bf, alpha_ff, alpha_ray, alpha_e


def oracle_lines(plan, st):
    """Per-line alpha/gamma/doppler (reference plasma/base.py:130-175 +
    broadening.py:32-732, non-VALD path: no /2)."""
    ld = plan.line_data
    t = np.asarray(st.t)
    n_e = np.asarray(st.electron_densities)
    n_level = np.asarray(st.level_number_density)
    n_h = np.asarray(st.ion_number_density)[plan.tables.slot_of(1, 0)]
    n_lines, n_depth = ld.n_lines, len(t)

    alpha = np.zeros((n_lines, n_depth))
    gamma = np.zeros((n_lines, n_depth))
    doppler = np.zeros((n_lines, n_depth))
    for li in range(n_lines):
        nu0 = ld.nu[li]
        stim = 1.0 - np.exp(-H_CGS * nu0 / (K_B_CGS * t))
        alpha[li] = (
            ALPHA_COEFFICIENT * ld.f_lu[li] * n_level[ld.lower_level_flat[li]]
            * stim
        )
        z = ld.ion_number[li] + 1.0
        chi = ld.ionization_energy[li]
        n_eff_u = z * np.sqrt(RYDBERG_ENERGY / (chi - ld.level_energy_upper[li]))
        n_eff_l = z * np.sqrt(RYDBERG_ENERGY / (chi - ld.level_energy_lower[li]))
        for d in range(n_depth):
            g = ld.A_ul[li]  # radiation
            if ld.atomic_number[li] == 1:  # linear Stark, H only
                a1 = 0.642 if (n_eff_u - n_eff_l) < 1.5 else 1.0
                g += 0.60 * a1 * (n_eff_u**2 - n_eff_l**2) * n_e[d] ** (2.0 / 3.0)
            # quadratic Stark (Traving 1960 C4 form)
            from stardis_tpu.constants import (
                A0_CGS,
                E_ESU,
                VACUUM_ELECTRIC_PERMITTIVITY,
            )

            c4_pre = (E_ESU**2 * A0_CGS**3) / (
                36.0 * H_CGS * VACUUM_ELECTRIC_PERMITTIVITY * z**4
            )
            c4 = c4_pre * (
                (n_eff_u * (5.0 * n_eff_u**2 + 1.0)) ** 2
                - (n_eff_l * (5.0 * n_eff_l**2 + 1.0)) ** 2
            )
            g += 1e19 * K_B_CGS * n_e[d] * c4 ** (2.0 / 3.0) * t[d] ** (1.0 / 6.0)
            # van der Waals (Unsoeld)
            from stardis_tpu.constants import M_P_CGS

            c6 = (
                6.46e-34
                * (
                    (5.0 * n_eff_u**4 + n_eff_u**2)
                    - (5.0 * n_eff_l**4 + n_eff_l**2)
                )
                / (2.0 * z**2)
            )
            g += (
                17.0
                * (8.0 * K_B_CGS * t[d] / (np.pi * M_P_CGS)) ** 0.3
                * c6**0.4
                * n_h[d]
            )
            gamma[li, d] = g
            doppler[li, d] = (
                nu0
                / C_CGS
                * np.sqrt(
                    2.0 * K_B_CGS * t[d] / ld.mass[li]
                    + plan.microturbulence_cgs**2
                )
            )
    return alpha, gamma, doppler


def oracle_raytrace(plan, alphas, source):
    """Literal van Noort sweep (reference base.py:85-268, plane-parallel)."""
    nus = plan.tracing_nus
    n_depth, n_nu = alphas.shape
    f_nu = np.zeros((n_depth, n_nu))
    for ti in range(plan.ray_distances.shape[1]):
        ds = plan.ray_distances[:, ti]  # [G]
        mean_a = np.exp(0.5 * (np.log(alphas[1:]) + np.log(alphas[:-1])))
        taus = mean_a * ds[:, None]  # [G, N]
        i_ray = np.zeros((n_depth, n_nu))
        for n in range(n_nu):
            for k in range(n_depth - 1):
                tau = taus[k, n]
                if tau == 0.0:
                    i_ray[k + 1, n] = i_ray[k, n]
                    continue
                # 3-regime weights (reference base.py:6-47)
                if tau < 5e-4:
                    w0 = tau * (1.0 - tau / 2.0)
                    w1 = tau**2 * (0.5 - tau / 3.0)
                    w2 = tau**3 * (1.0 / 3.0 - tau / 4.0)
                elif tau > 50.0:
                    w0, w1, w2 = 1.0, 1.0, 2.0
                else:
                    et = np.exp(-tau)
                    w0 = 1.0 - et
                    w1 = w0 - tau * et
                    w2 = 2.0 * w1 - tau * tau * et
                if k < n_depth - 2:
                    tau_kp1 = taus[k + 1, n]
                    s_k, s_kp1, s_kp2 = (
                        source[k, n], source[k + 1, n], source[k + 2, n]
                    )
                    tk = tau if tau != 0 else 1.0
                    tkp1 = tau_kp1 if tau_kp1 != 0 else 1.0
                    denom = tau + tau_kp1
                    denom = denom if denom != 0 else 1.0
                    second = w1 * (
                        (s_kp1 - s_kp2) * (tau / tkp1)
                        - (s_kp1 - s_k) * (tau_kp1 / tk)
                    ) / denom
                    third = w2 * (
                        (s_kp2 - s_kp1) / tkp1 + (s_k - s_kp1) / tk
                    ) / denom
                    i_ray[k + 1, n] = (
                        (1.0 - w0) * i_ray[k, n] + w0 * s_kp1 + second + third
                    )
                else:
                    # constant-source last jump (reference base.py:251-266)
                    third = w2 * (source[k, n] - source[k + 1, n]) / tau**2
                    i_ray[k + 1, n] = (
                        (1.0 - w0) * i_ray[k, n] + w0 * source[k + 1, n] + third
                    )
        f_nu += plan.weights[ti] * i_ray
    return f_nu


def oracle_blackbody(plan, st):
    nus = plan.tracing_nus
    t = np.asarray(st.t)
    return (2.0 * H_CGS * nus[None, :] ** 3 / C_CGS**2) / np.expm1(
        H_CGS * nus[None, :] / (K_B_CGS * t[:, None])
    )


def oracle_faddeeva_real(x, y):
    """Humlicek (1982) w4, transcribed scalar/complex from the published
    algorithm (the reference's voigt.py:17-86) — independent of the
    device's branchless real-pair evaluation."""
    z = complex(x, y)
    t = complex(y, -x)
    s = abs(x) + y
    if s > 15.0:
        w = 1j * z / np.sqrt(np.pi) / (z * z - 0.5)
    elif s > 5.5:
        w = (
            1j * z * (z * z / np.sqrt(np.pi) - 1.4104739589)
            / (0.75 + z * z * (z * z - 3.0))
        )
    elif y >= 0.195 * abs(x) - 0.176:
        num = 16.4955 + t * (
            20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236))
        )
        den = 16.4955 + t * (
            38.82363
            + t * (39.27121 + t * (21.69274 + t * (6.699398 + t)))
        )
        w = num / den
    else:
        u = t * t
        num = t * (
            36183.31
            - u * (3321.99 - u * (1540.787 - u * (
                219.031 - u * (35.7668 - u * (1.320522 - u * 0.56419))
            )))
        )
        den = 32066.6 - u * (
            24322.8
            - u * (9022.23 - u * (2186.18 - u * (
                364.219 - u * (61.5704 - u * (1.84144 - u))
            )))
        )
        w = np.exp(u) - num / den
    return w.real


def oracle_line_accumulation(plan, alpha, gamma, doppler):
    """Reference windowing rules (base.py:556-575) + Humlicek Voigt with the
    gamma/(sqrt(pi) pi) convention (reference voigt.py:113-150)."""
    grid = plan.tracing_nus
    n_nu = len(grid)
    n_lines, n_depth = alpha.shape
    d_nu = -np.max(np.diff(grid))
    rev = grid[::-1]
    centers = (n_nu - np.searchsorted(rev, plan.line_data.nu)).astype(int)
    out = np.zeros((n_depth, n_nu))
    for li in range(n_lines):
        for d in range(n_depth):
            win = max(
                10, (gamma[li, d] + doppler[li, d]) * alpha[li, d] / d_nu * 20.0
            )
            lo = max(centers[li] - int(win), 0)
            hi = min(centers[li] + int(win), n_nu)
            for n in range(lo, hi):
                dnu = grid[n] - plan.line_data.nu[li]
                xx = dnu / doppler[li, d]
                yy = gamma[li, d] / (np.sqrt(np.pi) * np.pi) / doppler[li, d]
                phi = oracle_faddeeva_real(xx, yy) / (
                    np.sqrt(np.pi) * doppler[li, d]
                )
                out[d, n] += phi * alpha[li, d]
    return out


def test_e2e_oracle_matches_device(small_run):

    plan, state, f_dev, total_dev, opac_dev = small_run

    a_bf, a_ff, a_ray, a_e = oracle_continuum(plan, state)
    np.testing.assert_allclose(opac_dev["alpha_bf"], a_bf, rtol=1e-8)
    np.testing.assert_allclose(opac_dev["alpha_ff"], a_ff, rtol=1e-8)
    np.testing.assert_allclose(opac_dev["alpha_rayleigh"], a_ray, rtol=1e-8)
    np.testing.assert_allclose(opac_dev["alpha_electron"], a_e, rtol=1e-8)

    alpha, gamma, doppler = oracle_lines(plan, state)
    np.testing.assert_allclose(
        opac_dev["alpha_line_at_nu_gammas"], gamma, rtol=1e-8
    )
    np.testing.assert_allclose(
        opac_dev["alpha_line_at_nu_doppler_widths"], doppler, rtol=1e-8
    )
    a_line = oracle_line_accumulation(plan, alpha, gamma, doppler)
    np.testing.assert_allclose(
        opac_dev["alpha_line_at_nu"], a_line, rtol=1e-8, atol=1e-30
    )

    total = a_bf + a_ff + a_ray + a_e + a_line
    np.testing.assert_allclose(total_dev, total, rtol=1e-7)

    source = oracle_blackbody(plan, state)
    f_oracle = oracle_raytrace(plan, total, source)
    np.testing.assert_allclose(f_dev, f_oracle, rtol=1e-8)
