"""HDF5 serialization of simulation results.

Replaces the reference's TARDIS HDFWriterMixin surface (used at reference
model/base.py:31, radiation_field/base.py:45 and by the regression
framework util/regression_data.py:136-160) with h5py-backed writers: each
object's ``hdf_properties`` arrays/scalars land under ``<group>/<name>``.
"""

from __future__ import annotations

import numpy as np


def _write_item(grp, name, value):
    import pandas as pd

    if value is None:
        return
    if hasattr(value, "unit") and hasattr(value, "value"):  # Quantity
        value = np.asarray(value)
    if isinstance(value, pd.DataFrame):
        sub = grp.create_group(name)
        sub.attrs["pandas"] = "frame"
        sub.create_dataset("values", data=value.values)
        idx = value.index
        if isinstance(idx, pd.MultiIndex):
            for i, lev in enumerate(idx.names):
                sub.create_dataset(
                    f"index_{i}", data=np.asarray(idx.get_level_values(i))
                )
        else:
            sub.create_dataset("index_0", data=np.asarray(idx))
        return
    if isinstance(value, pd.Series):
        sub = grp.create_group(name)
        sub.attrs["pandas"] = "series"
        sub.create_dataset("values", data=value.values)
        sub.create_dataset("index_0", data=np.asarray(value.index))
        return
    if isinstance(value, dict):
        sub = grp.create_group(name)
        for k, v in value.items():
            _write_item(sub, str(k), v)
        return
    arr = np.asarray(value)
    if arr.dtype == object:
        arr = arr.astype("S")
    grp.create_dataset(name, data=arr)


def write_group(h5file, group_name, mapping):
    grp = h5file.require_group(group_name)
    for name, value in mapping.items():
        _write_item(grp, name, value)


def output_to_hdf(output, path):
    """Serialize a STARDISOutput: spectra + (when attached) model,
    plasma state and radiation field."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["format"] = "stardis_tpu_output_v1"
        write_group(
            f,
            "spectrum",
            {
                "nus": output.nus,
                "lambdas": output.lambdas,
                "spectrum_nu": output.spectrum_nu,
                "spectrum_lambda": output.spectrum_lambda,
            },
        )
        model = getattr(output, "stellar_model", None)
        if model is not None:
            write_group(
                f,
                "stellar_model",
                {
                    "temperatures": model.temperatures,
                    "r": model.geometry.r,
                    "density": model.composition.density,
                    "nuclide_mass_fraction": model.composition.nuclide_mass_fraction,
                },
            )
        plasma = getattr(output, "stellar_plasma", None)
        if plasma is not None:
            write_group(f, "stellar_plasma", plasma._asdict())
        rf = getattr(output, "stellar_radiation_field", None)
        if rf is not None:
            write_group(
                f,
                "radiation_field",
                {
                    "frequencies": rf.frequencies,
                    "F_nu": rf.F_nu,
                    "opacities": rf.opacities.opacities_dict,
                    "total_alphas": rf.opacities.total_alphas,
                },
            )
    return path
