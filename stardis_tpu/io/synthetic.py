"""Synthetic MARCS-format atmosphere generator.

The reference ships real MARCS files (docs/quickstart/sun.mod); this
environment cannot redistribute them, so tests and benchmarks build
sun-like atmospheres from first principles instead:

* gray Eddington temperature stratification  T^4 = (3/4) Teff^4 (tau + 2/3),
* hydrostatic equilibrium  dP/dtau = g / kappa(rho, T)  with an H-
  Rosseland-mean opacity fit, integrated on a log-tau grid,
* ideal-gas density, Asplund-2009 abundances.

The output is written in the MARCS plane-parallel ``.mod`` layout so it also
exercises the production reader end-to-end.
"""

from __future__ import annotations

import numpy as np

from stardis_tpu.constants import AMU_CGS, K_B_CGS
from stardis_tpu.io.abundances import ASPLUND_2009


def gray_atmosphere_structure(
    teff=5777.0,
    logg=4.44,
    n_depth=56,
    log_tau_min=-5.0,
    log_tau_max=2.0,
    mu_mol=1.26,
):
    """Return dict of arrays (tau, T, Pg, Pe, rho, depth) surface->interior."""
    grav = 10.0**logg
    tau = np.logspace(log_tau_min, log_tau_max, n_depth)
    temp = (0.75 * teff**4 * (tau + 2.0 / 3.0)) ** 0.25

    def kappa_ross(t):
        # H--dominated Rosseland mean: steep T dependence, calibrated so
        # kappa(T_phot of the Sun) = 0.3 cm^2/g, capped where H bf takes over.
        return np.clip(0.3 * (t / 6420.0) ** 9, 1e-3, 3.0)

    kap = kappa_ross(temp)
    pressure = np.zeros_like(tau)
    pressure[0] = grav * tau[0] / kap[0]
    for i in range(1, n_depth):
        dtau = tau[i] - tau[i - 1]
        k_mid = 0.5 * (kap[i] + kap[i - 1])
        pressure[i] = pressure[i - 1] + grav / k_mid * dtau
    rho = pressure * mu_mol * AMU_CGS / (K_B_CGS * temp)

    # geometric depth (0 at tau=1, increasing inward)
    dz = np.zeros_like(tau)
    dz[1:] = np.diff(tau) / (0.5 * (kap[1:] * rho[1:] + kap[:-1] * rho[:-1]))
    z = np.cumsum(dz)
    i_phot = np.searchsorted(tau, 1.0)
    depth = z - z[i_phot]

    pe = 1e-4 * pressure * (temp / teff) ** 5  # rough electron pressure
    return {
        "tau": tau,
        "temperature": temp,
        "pressure": pressure,
        "pe": pe,
        "rho": rho,
        "depth": depth,
    }


def write_marcs_file(
    path,
    teff=5777.0,
    logg=4.44,
    n_depth=56,
    microturbulence=1.0,
    feh=0.0,
    afe=0.0,
    abundances=None,
    spherical=False,
    radius_cm=6.957e10,
    mass_msun=1.0,
):
    """Write a synthetic MARCS ``.mod`` file (plane-parallel or spherical)."""
    s = gray_atmosphere_structure(teff=teff, logg=logg, n_depth=n_depth)
    grav = 10.0**logg
    flux = 5.6704e-5 * teff**4  # sigma_sb cgs

    if abundances is None:
        abundances = [ASPLUND_2009.get(z, -99.0) for z in range(1, 93)]

    lines = []
    tag = "sph" if spherical else "pp"
    lines.append(f"sun_synthetic_{tag}_t{int(teff)}_g{logg:+.1f}")
    lines.append(f"  {teff:.0f}.      Teff [K].         Last iteration; yyyymmdd=20260101")
    lines.append(f"  {flux:.4E} Flux [erg/cm2/s]")
    lines.append(f"  {grav:.4E} Surface gravity [cm/s2]")
    lines.append(f"  {microturbulence:.1f}        Microturbulence parameter [km/s]")
    if spherical:
        lines.append(f"  {mass_msun:.4f}     Mass [solar masses]")
    else:
        lines.append("  0.0        No mass for plane-parallel models")
    lines.append(
        f" {feh:+.2f} {afe:+.2f} Metallicity [Fe/H] and [alpha/Fe]"
    )
    if spherical:
        lines.append(f"  {radius_cm:.4E} Radius [cm] at Tau(Rosseland)=1.0")
        lines.append("  1.0000E+00 Luminosity [Lsun]")
    else:
        lines.append("  1.0000E+00 1 cm radius for plane-parallel models")
        lines.append("  3.8899E-23 Luminosity [Lsun] FOR A RADIUS OF 1 cm!")
    lines.append(
        "  1.50 8.00 0.076 0.00 are the convection parameters: alpha, nu, y and beta"
    )
    lines.append(
        "  0.73826 0.24954 1.22E-02 are X, Y and Z, 12C/13C=89 (=solar)"
    )
    lines.append("Logarithmic chemical number abundances, H always 12.00")
    for i in range(0, 92, 10):
        row = abundances[i : i + 10]
        lines.append(" " + " ".join(f"{a:6.2f}" for a in row))
    lines.append(f"  {n_depth} Number of depth points")
    lines.append("Model structure")
    lines.append(
        " k lgTauR  lgTau5    Depth     T        Pe         Pg        Prad       Pturb"
    )
    lg_tau = np.log10(s["tau"])
    for k in range(n_depth):
        lines.append(
            f"{k + 1:3d} {lg_tau[k]:5.2f} {lg_tau[k]:7.4f} {s['depth'][k]: .3E}"
            f" {s['temperature'][k]:7.1f} {s['pe'][k]: .3E} {s['pressure'][k]: .3E}"
            f"  1.000E-01  0.000E+00"
        )
    lines.append(
        " k lgTauR  KappaRoss   Density   Mu      Vconv   Fconv/F      RHOX"
    )
    for k in range(n_depth):
        lines.append(
            f"{k + 1:3d} {lg_tau[k]:5.2f}  1.000E-02 {s['rho'][k]: .3E} 1.300"
            f"  0.000E+00 0.00000  1.000000E-02"
        )
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def write_mesa_file(path, teff=5777.0, logg=4.44, n_shells=80,
                    radius_cm=6.957e10, mass_msun=1.0):
    """Write a synthetic MESA ``.mod`` profile (surface layers of a star).

    Shells are ordered outermost-first, as MESA writes them; the structure
    reuses the gray-atmosphere solution.  Numbers use MESA's Fortran
    D-exponent convention so the production reader's D->E handling is
    exercised.
    """

    def dfmt(x):
        return f"{x:.10E}".replace("E", "D")

    s = gray_atmosphere_structure(teff=teff, logg=logg, n_depth=n_shells)
    # surface-first ordering; radius decreases inward
    r = radius_cm - (s["depth"] - s["depth"][0])
    lines = []
    lines.append("! synthetic MESA model (stardis_tpu)")
    lines.append("")
    lines.append("          version_number   11701")
    lines.append(f"          M/Msun           {dfmt(mass_msun)}")
    lines.append("          model_number     1000")
    lines.append(f"          star_age         {dfmt(4.6e9)}")
    lines.append(f"          initial_z        {dfmt(0.02)}")
    lines.append(f"          n_shells         {n_shells}")
    lines.append("          net_name         'basic.net'")
    lines.append("          species          8")
    lines.append(f"          Teff             {dfmt(teff)}")
    lines.append("")
    # pad so the data header lands at the reader's fixed offset (row 24)
    while len(lines) < 23:
        lines.append("!")
    header = ["zone", "lnd", "lnT", "lnR", "L", "dq"]
    lines.append(" ".join(f"{h:>24s}" for h in header))
    for k in range(n_shells):
        row = [
            f"{k + 1:5d}",
            dfmt(np.log(s["rho"][k])),
            dfmt(np.log(s["temperature"][k])),
            dfmt(np.log(r[k])),
            dfmt(3.828e33),
            dfmt(1.0 / n_shells),
        ]
        lines.append(" ".join(f"{v:>24s}" for v in row))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path
