from stardis_tpu.atom_data.base import AtomData, MoleculeData, einstein_a_from_f_lu
from stardis_tpu.atom_data.builtin import build_builtin_atom_data
from stardis_tpu.atom_data.download import download_atom_data

__all__ = [
    "AtomData",
    "MoleculeData",
    "einstein_a_from_f_lu",
    "build_builtin_atom_data",
    "download_atom_data",
]
