"""MESA model reader (reference stardis/io/model/mesa.py).

Reads MESA ``.mod`` profile files: regex metadata block (Fortran D-exponent
floats), shell table with lnR / lnT / lnd columns, uniform scaled-solar
composition (MESA models carry no per-shell abundances in this format).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

from stardis_tpu import units as u
from stardis_tpu.io.abundances import (
    ASPLUND_2009_HE_MASS_FRAC_Y,
    ASPLUND_2009_HEAVY_MASS_FRAC_Z,
    create_scaled_solar_profile,
)
from stardis_tpu.model.base import Composition, Radial1DGeometry, StellarModel

logger = logging.getLogger(__name__)

_METADATA_RE = [
    (r"version_number\s+(\S+)", "Version number", str),
    (r"M/Msun\s+(\S+)", "Mass", float),
    (r"model_number\s+(\S+)", "Model Number", int),
    (r"star_age\s+(\S+)", "Star Age", float),
    (r"initial_z\s+(\S+)", "Initial Z", float),
    (r"n_shells\s+(\S+)", "Number of Shells", int),
    (r"net_name\s+(\S+)", "Net Name", str),
    (r"species\s+(\S+)", "Number of Species", int),
    (r"Teff\s+(\S+)", "Effective Temperature", float),
]


@dataclass
class MESAModel:
    metadata: dict
    data: pd.DataFrame

    def truncate_model(self, shell_number):
        """Keep only the outermost ``shell_number`` shells (MESA indexes
        shells from the surface inward; reference mesa.py:28-35)."""
        self.data = self.data[self.data.index <= shell_number]

    def to_geometry(self):
        r = np.exp(self.data.lnR.values[::-1])  # innermost -> surface, cm
        return Radial1DGeometry(u.Quantity(r, u.cm))

    def to_uniform_composition_from_solar(
        self,
        atom_data,
        helium_mass_frac_Y=ASPLUND_2009_HE_MASS_FRAC_Y,
        heavy_metal_mass_frac_Z=ASPLUND_2009_HEAVY_MASS_FRAC_Z,
        final_atomic_number=138,
    ):
        density = np.exp(self.data.lnd.values[::-1])
        profile = create_scaled_solar_profile(
            atom_data,
            helium_mass_frac_Y,
            heavy_metal_mass_frac_Z,
            final_atomic_number=min(
                final_atomic_number, int(atom_data.atom_data.index.max())
            ),
            composition_source="asplund_2009",
        )
        n_depth = len(self.data)
        mass_frac = pd.DataFrame(
            np.repeat(profile.values, n_depth, axis=1),
            index=profile.index,
            columns=range(n_depth),
        )
        return Composition(
            u.Quantity(density, u.g / u.cm**3),
            mass_frac,
            element_masses=atom_data.atom_data.mass.copy(),
        )

    def to_stellar_model(
        self,
        atom_data,
        truncate_to_shell_number=None,
        helium_mass_frac_Y=ASPLUND_2009_HE_MASS_FRAC_Y,
        heavy_metal_mass_frac_Z=ASPLUND_2009_HEAVY_MASS_FRAC_Z,
        final_atomic_number=138,
    ):
        if truncate_to_shell_number is not None:
            self.truncate_model(truncate_to_shell_number)
        geometry = self.to_geometry()
        composition = self.to_uniform_composition_from_solar(
            atom_data,
            helium_mass_frac_Y,
            heavy_metal_mass_frac_Z,
            final_atomic_number=final_atomic_number,
        )
        temperatures = u.Quantity(np.exp(self.data.lnT.values[::-1]), u.K)
        return StellarModel(temperatures, geometry, composition)


def read_mesa_metadata(fpath):
    with open(fpath, "rt") as fh:
        lines = fh.readlines()

    metadata = {}
    start = next(
        (i for i, ln in enumerate(lines) if re.search(_METADATA_RE[0][0], ln)), None
    )
    if start is None:
        raise ValueError(f"{fpath}: no MESA metadata block found")
    block = lines[start : start + 40]
    for pattern, name, caster in _METADATA_RE:
        for ln in block:
            m = re.search(pattern, ln)
            if m:
                raw = m.group(1).replace("D", "e")
                metadata[name] = caster(raw) if caster is not str else raw
                break
    metadata["Mass"] = u.Quantity(metadata["Mass"], u.M_sun)
    metadata["Star Age"] = u.Quantity(metadata["Star Age"], u.yr)
    metadata["Effective Temperature"] = u.Quantity(
        metadata["Effective Temperature"], u.K
    )
    return metadata


def read_mesa_data(fpath, mesa_shells):
    ROWS_TO_SKIP = 23
    frame = pd.read_csv(
        fpath,
        skiprows=ROWS_TO_SKIP,
        sep=r"\s+",
        nrows=mesa_shells,
        index_col=0,
        comment="!",
    )
    return frame.apply(lambda col: col.str.replace("D", "E").astype(float))


def read_mesa_model(fpath):
    metadata = read_mesa_metadata(fpath)
    data = read_mesa_data(fpath, metadata["Number of Shells"])
    return MESAModel(metadata, data)
