"""Atomic data store.

Replaces the TARDIS ``AtomData`` dependency of the reference framework
(consumed at reference stardis/io/base.py:67 and throughout the plasma layer,
see SURVEY.md §2.8).  Logical tables follow the carsus schema:

* ``atom_data``       : per-element symbol/name/mass [g], indexed by Z
* ``ionization_data`` : Series (atomic_number, ion_number) -> chi [erg],
                        where ion_number is the charge state *produced* by the
                        ionization (H I -> H II is (1, 1)).
* ``levels``          : (atomic_number, ion_number, level_number) ->
                        energy [erg], g, metastable
* ``lines``           : line_id -> atomic_number, ion_number,
                        level_number_lower, level_number_upper, nu [Hz],
                        f_lu, A_ul [1/s], wavelength_cm
* ``linelist_atoms`` / ``linelist_molecules`` : VALD-style linelists
                        (wavelength [AA], log_gf, e_low/e_up [eV], j_lo/j_up,
                        rad/stark/waals broadening parameters)
* ``molecule_data``   : Barklem & Collet 2016 equilibrium constants /
                        partition functions / dissociation energies

Storage is plain HDF5 via h5py (documented divergence: carsus writes
pandas/pytables files, which require the ``tables`` package at read time).
``from_hdf`` reads ONLY the native layout; carsus files must be converted
once with ``stardis_tpu.atom_data.convert`` (CLI:
``python -m stardis_tpu.atom_data.convert carsus.h5 native.h5``), run in an
environment where pytables exists.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd

from stardis_tpu.constants import (
    C_CGS,
    E_ESU,
    M_E_CGS,
)


@dataclasses.dataclass
class MoleculeData:
    """Barklem & Collet 2016 molecular tables.

    equilibrium_constants : DataFrame, index molecule name, columns sample
        temperatures [K], values log10 of the pressure equilibrium constant
        in Pa (matches carsus; consumed at reference plasma/molecules.py:85-103).
    partition_functions : DataFrame, same layout, values U(T).
    dissociation_energies : DataFrame index molecule -> Ion1, Ion2 symbols +
        dissociation energy [eV].
    """

    equilibrium_constants: pd.DataFrame
    partition_functions: pd.DataFrame
    dissociation_energies: pd.DataFrame


def einstein_a_from_f_lu(nu, g_lower, g_upper, f_lu):
    """A_ul = (8 pi^2 e^2 nu^2) / (m_e c^3) * (g_l / g_u) * f_lu  [1/s]."""
    coeff = 8.0 * np.pi**2 * E_ESU**2 / (M_E_CGS * C_CGS**3)
    return coeff * nu**2 * (g_lower / g_upper) * f_lu


class AtomData:
    def __init__(
        self,
        atom_data: pd.DataFrame,
        ionization_data: pd.Series,
        levels: pd.DataFrame,
        lines: pd.DataFrame,
        linelist_atoms: pd.DataFrame | None = None,
        linelist_molecules: pd.DataFrame | None = None,
        molecule_data: MoleculeData | None = None,
    ):
        self.atom_data = atom_data
        self.ionization_data = ionization_data
        self.levels = levels
        self.lines = lines
        self.linelist_atoms = linelist_atoms
        self.linelist_molecules = linelist_molecules
        self.molecule_data = molecule_data
        self.selected_atomic_numbers = np.asarray(
            atom_data.index.values, dtype=np.int64
        )

    # ------------------------------------------------------------------
    def prepare_atom_data(self, selected_atomic_numbers, **_ignored):
        """Restrict tables to the selected elements (mirrors TARDIS
        ``prepare_atom_data``, reference io/base.py:103-117)."""
        sel = np.asarray(sorted(int(z) for z in selected_atomic_numbers))
        self.selected_atomic_numbers = sel
        self.atom_data = self.atom_data.loc[self.atom_data.index.isin(sel)]
        ion_z = self.ionization_data.index.get_level_values("atomic_number")
        self.ionization_data = self.ionization_data[ion_z.isin(sel)]
        lev_z = self.levels.index.get_level_values("atomic_number")
        self.levels = self.levels[lev_z.isin(sel)]
        self.lines = self.lines[self.lines.atomic_number.isin(sel)]
        if self.linelist_atoms is not None:
            self.linelist_atoms = self.linelist_atoms[
                self.linelist_atoms.atomic_number.isin(sel)
            ]
        return self

    # ------------------------------------------------------------------
    # HDF5 serialization (h5py; native layout)
    # ------------------------------------------------------------------
    def to_hdf(self, path):
        import h5py

        with h5py.File(path, "w") as f:
            f.attrs["format"] = "stardis_tpu_atom_data_v1"
            grp = f.create_group("atom_data")
            grp.create_dataset("atomic_number", data=self.atom_data.index.values)
            grp.create_dataset(
                "symbol",
                data=np.array(self.atom_data.symbol.values, dtype="S8"),
            )
            grp.create_dataset("mass", data=self.atom_data.mass.values)

            grp = f.create_group("ionization_data")
            idx = self.ionization_data.index
            grp.create_dataset(
                "atomic_number", data=idx.get_level_values("atomic_number")
            )
            grp.create_dataset("ion_number", data=idx.get_level_values("ion_number"))
            grp.create_dataset("ionization_energy", data=self.ionization_data.values)

            grp = f.create_group("levels")
            idx = self.levels.index
            for name in ("atomic_number", "ion_number", "level_number"):
                grp.create_dataset(name, data=idx.get_level_values(name))
            grp.create_dataset("energy", data=self.levels.energy.values)
            grp.create_dataset("g", data=self.levels.g.values)
            grp.create_dataset(
                "metastable", data=self.levels.metastable.values.astype(bool)
            )

            grp = f.create_group("lines")
            for col in (
                "atomic_number",
                "ion_number",
                "level_number_lower",
                "level_number_upper",
                "nu",
                "f_lu",
                "A_ul",
                "wavelength_cm",
            ):
                grp.create_dataset(col, data=self.lines[col].values)

            for name, ll in (
                ("linelist_atoms", self.linelist_atoms),
                ("linelist_molecules", self.linelist_molecules),
            ):
                if ll is None:
                    continue
                grp = f.create_group(name)
                for col in ll.columns:
                    # np.asarray also flattens pandas extension arrays
                    # (StringDtype) to object, which the kind check catches
                    data = np.asarray(ll[col].values)
                    if data.dtype.kind in ("O", "U"):
                        data = np.array(data, dtype="S16")
                    grp.create_dataset(col, data=data)

            if self.molecule_data is not None:
                md = self.molecule_data
                grp = f.create_group("molecule_data")
                for name, df in (
                    ("equilibrium_constants", md.equilibrium_constants),
                    ("partition_functions", md.partition_functions),
                ):
                    sub = grp.create_group(name)
                    sub.create_dataset(
                        "molecule", data=np.array(df.index.values, dtype="S16")
                    )
                    sub.create_dataset(
                        "temperatures", data=df.columns.values.astype(float)
                    )
                    sub.create_dataset("values", data=df.values)
                sub = grp.create_group("dissociation_energies")
                de = md.dissociation_energies
                sub.create_dataset(
                    "molecule", data=np.array(de.index.values, dtype="S16")
                )
                for col in de.columns:
                    data = np.asarray(de[col].values)
                    if data.dtype.kind in ("O", "U"):
                        data = np.array(data, dtype="S16")
                    sub.create_dataset(col, data=data)

    # ------------------------------------------------------------------
    @classmethod
    def from_hdf(cls, path):
        import h5py

        with h5py.File(path, "r") as f:
            if f.attrs.get("format", "") != "stardis_tpu_atom_data_v1":
                raise ValueError(
                    f"{path}: not a stardis_tpu atom-data file. carsus/pytables "
                    "files are not readable without the 'tables' package; "
                    "convert with stardis_tpu.atom_data.convert (documented "
                    "divergence from the reference, which reads pytables HDF)."
                )
            grp = f["atom_data"]
            atom_data = pd.DataFrame(
                {
                    "symbol": [s.decode() for s in grp["symbol"][:]],
                    "mass": grp["mass"][:],
                },
                index=pd.Index(grp["atomic_number"][:], name="atomic_number"),
            )

            grp = f["ionization_data"]
            ionization_data = pd.Series(
                grp["ionization_energy"][:],
                index=pd.MultiIndex.from_arrays(
                    [grp["atomic_number"][:], grp["ion_number"][:]],
                    names=["atomic_number", "ion_number"],
                ),
                name="ionization_energy",
            )

            grp = f["levels"]
            levels = pd.DataFrame(
                {
                    "energy": grp["energy"][:],
                    "g": grp["g"][:],
                    "metastable": grp["metastable"][:],
                },
                index=pd.MultiIndex.from_arrays(
                    [
                        grp["atomic_number"][:],
                        grp["ion_number"][:],
                        grp["level_number"][:],
                    ],
                    names=["atomic_number", "ion_number", "level_number"],
                ),
            )

            grp = f["lines"]
            lines = pd.DataFrame({col: grp[col][:] for col in grp})

            def read_ll(name):
                if name not in f:
                    return None
                grp = f[name]
                cols = {}
                for col in grp:
                    data = grp[col][:]
                    if data.dtype.kind == "S":
                        data = np.array([s.decode() for s in data])
                    cols[col] = data
                return pd.DataFrame(cols)

            linelist_atoms = read_ll("linelist_atoms")
            linelist_molecules = read_ll("linelist_molecules")

            molecule_data = None
            if "molecule_data" in f:
                grp = f["molecule_data"]

                def read_table(name):
                    sub = grp[name]
                    return pd.DataFrame(
                        sub["values"][:],
                        index=pd.Index(
                            [s.decode() for s in sub["molecule"][:]], name="molecule"
                        ),
                        columns=sub["temperatures"][:],
                    )

                sub = grp["dissociation_energies"]
                cols = {}
                for col in sub:
                    if col == "molecule":
                        continue
                    data = sub[col][:]
                    if data.dtype.kind == "S":
                        data = np.array([s.decode() for s in data])
                    cols[col] = data
                de = pd.DataFrame(
                    cols,
                    index=pd.Index(
                        [s.decode() for s in sub["molecule"][:]], name="molecule"
                    ),
                )
                molecule_data = MoleculeData(
                    read_table("equilibrium_constants"),
                    read_table("partition_functions"),
                    de,
                )

        return cls(
            atom_data,
            ionization_data,
            levels,
            lines,
            linelist_atoms,
            linelist_molecules,
            molecule_data,
        )
