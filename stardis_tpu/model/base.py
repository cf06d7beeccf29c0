"""Stellar model containers.

Mirrors reference stardis/model/base.py (StellarModel) and
stardis/model/geometry/radial1d.py (Radial1DGeometry); the Composition class
replaces the TARDIS ``tardis.model.matter.composition.Composition``
dependency (reference io/model/marcs.py:12, SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stardis_tpu import units as u


class Radial1DGeometry:
    """Radial coordinates of the depth points, innermost -> surface.

    Parameters
    ----------
    r : Quantity [cm]
    reference_r : Quantity or None — photospheric radius for the spherical
        flux correction (reference radial1d.py:1-24).
    """

    def __init__(self, r, reference_r=None):
        self.r = r
        self.reference_r = reference_r

    @property
    def dist_to_next_depth_point(self):
        rv = np.asarray(self.r)
        return rv[1:] - rv[:-1]


class Composition:
    """Density + per-element mass fractions of the atmosphere.

    Parameters
    ----------
    density : Quantity [g/cm^3], shape (n_depth,)
    nuclide_mass_fraction : DataFrame indexed by atomic_number, columns are
        depth-point indices (0 = innermost).
    element_masses : Series atomic_number -> mass [g].
    """

    def __init__(self, density, nuclide_mass_fraction, element_masses):
        self.density = density
        # accept a (Z, mass_number) MultiIndex like the reference builds and
        # collapse to atomic_number
        if isinstance(nuclide_mass_fraction.index, pd.MultiIndex):
            nuclide_mass_fraction = nuclide_mass_fraction.groupby(
                level="atomic_number"
            ).sum()
        self.nuclide_mass_fraction = nuclide_mass_fraction
        self.element_masses = element_masses

    @property
    def elemental_mass_fraction(self):
        return self.nuclide_mass_fraction

    @property
    def nuclide_masses(self):
        return self.element_masses.loc[self.nuclide_mass_fraction.index]

    @property
    def elemental_number_density(self):
        """DataFrame [atomic_number x depth] in 1/cm^3."""
        rho = np.asarray(self.density)  # g/cm^3 cgs
        masses = self.element_masses.loc[self.nuclide_mass_fraction.index].values
        number = self.nuclide_mass_fraction.values * rho[np.newaxis, :] / masses[:, None]
        return pd.DataFrame(
            number,
            index=self.nuclide_mass_fraction.index,
            columns=self.nuclide_mass_fraction.columns,
        )


class StellarModel:
    """Temperatures + geometry + composition (reference model/base.py:5-49)."""

    def __init__(
        self,
        temperatures,
        geometry,
        composition,
        spherical=False,
        microturbulence=None,
    ):
        self.temperatures = temperatures
        self.geometry = geometry
        self.composition = composition
        self.spherical = spherical
        if microturbulence is None:
            microturbulence = u.Quantity(0.0, u.km / u.s)
        self.microturbulence = microturbulence

    @property
    def no_of_depth_points(self):
        return np.asarray(self.temperatures).shape[0]
