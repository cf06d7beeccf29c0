"""Physical constants in CGS units.

All values follow CODATA 2018 (the same values astropy 5.x/6.x `const.*.cgs`
resolves to), so numerical parity with the reference implementation
(`/root/reference/stardis/...`, which uses `astropy.constants`) is preserved
without depending on astropy.
"""

import numpy as np

# Fundamental (CODATA 2018, CGS)
C_CGS = 2.99792458e10  # speed of light [cm/s]
H_CGS = 6.62607015e-27  # Planck constant [erg s]
K_B_CGS = 1.380649e-16  # Boltzmann constant [erg/K]
M_E_CGS = 9.1093837015e-28  # electron mass [g]
M_P_CGS = 1.67262192369e-24  # proton mass [g]
E_ESU = 4.80320425e-10  # elementary charge [esu = statC]
A0_CGS = 5.29177210903e-9  # Bohr radius [cm]
AMU_CGS = 1.66053906660e-24  # atomic mass unit [g]
SIGMA_T_CGS = 6.6524587321e-25  # Thomson cross-section [cm^2]
EV_TO_ERG = 1.602176634e-12  # electron-volt [erg]

# Rydberg constant (infinite-mass) [1/cm] and derived quantities
RYD_CM = 1.0973731568160e5
RYDBERG_FREQUENCY = C_CGS * RYD_CM  # [Hz]  (reference: opacities_solvers/base.py:34)
RYDBERG_ENERGY = H_CGS * C_CGS * RYD_CM  # [erg] (reference: broadening.py:20)

# Derived combos used throughout (cf. reference stardis/plasma/base.py:33-36)
# THERMAL_DE_BROGLIE_CONST = h^2 / (2 pi k_B)  [erg s^2 K]
THERMAL_DE_BROGLIE_CONST = H_CGS**2 / (2.0 * np.pi * K_B_CGS)
# ALPHA_COEFFICIENT = pi e^2 / (m_e c)  [cm^2 Hz]
ALPHA_COEFFICIENT = np.pi * E_ESU**2 / (M_E_CGS * C_CGS)

# BF_CONSTANT (reference: opacities_solvers/base.py:21-27)
BF_CONSTANT = (
    64.0
    * np.pi**4
    * E_ESU**10
    * M_E_CGS
    / (3.0 * np.sqrt(3.0) * C_CGS * H_CGS**6)
)
# FF_CONSTANT (reference: opacities_solvers/base.py:28-33)
FF_CONSTANT = (
    4.0
    / (3.0 * H_CGS * C_CGS)
    * E_ESU**6
    * np.sqrt(2.0 * np.pi / (3.0 * M_E_CGS**3 * K_B_CGS))
)

VACUUM_ELECTRIC_PERMITTIVITY = 1.0 / (4.0 * np.pi)  # Gaussian units

H_MINUS_CHI_EV = 0.754195  # H^- binding energy [eV] (plasma/base.py:34)
H2_DISSOCIATION_ENERGY_EV = 4.476  # [eV] (plasma/base.py:35)
H2_IONIZATION_ENERGY_EV = 15.422  # [eV] (plasma/base.py:37)

C_KMS = C_CGS / 1e5  # speed of light [km/s]

SQRT_PI = float(np.sqrt(np.pi))
