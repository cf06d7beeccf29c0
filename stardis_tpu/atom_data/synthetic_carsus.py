"""Full-scale synthetic carsus-format atom-data stores.

The reference's entire data pathway is
``AtomData.from_hdf(kurucz_cd23_chianti_H_He.h5)`` + ``prepare_atom_data``
(reference io/base.py:67,103-117; the file is a pandas/pytables HDFStore
written by carsus and downloaded in reference conftest.py:60-62).  This
environment has neither network access nor a real kurucz file, so this
module generates a kurucz-SCALE store in the same logical schema — 10^5+
lines between actual level pairs, full level ladders for Z <= 30, VALD
linelists, B&C-convention molecular tables — and writes it in the pandas
fixed-format HDF5 layout so the ``stardis_tpu.atom_data.convert`` CLI can
ingest it exactly as it would a carsus file:

    python -m stardis_tpu.atom_data.synthetic_carsus /tmp/carsus_synth.h5
    python -m stardis_tpu.atom_data.convert /tmp/carsus_synth.h5 native.h5

Physical anchors are real where the package has them (NIST ionization
energies, ground-term statistical weights, atomic masses); excited-level
ladders and oscillator strengths are synthetic but drawn to kurucz-like
distributions (energies filling (0, 0.97 chi), log gf in [-7, 0.5]).
Columns/units follow carsus conventions: masses in u, energies in eV,
wavelengths in AA (the converter owns the unit normalization).

The fixed-format writer/reader pair below implements the pandas
``format="fixed"`` on-disk layout (axis0/axis1 index arrays,
block{i}_items/values, multi-index level/label arrays) with h5py, so no
pytables dependency is needed on either side.  It is validated against
this module's writer; reading a store written by pandas itself follows the
same layout spec but is untestable here (no pytables to produce one) —
``load_carsus_store`` still prefers real pytables when installed.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

from stardis_tpu.atom_data.builtin import (
    GROUND_G,
    NIST_IONIZATION_EV,
)
from stardis_tpu.util.species import ATOMIC_WEIGHTS_AMU, ELEMENT_SYMBOLS

# ----------------------------------------------------------------------
# frame generation (carsus units: u, eV, AA)
# ----------------------------------------------------------------------


def build_carsus_frames(
    z_max: int = 30,
    n_lines: int = 150_000,
    n_vald_lines: int = 120_000,
    levels_per_ion: int = 160,
    lam_lo_aa: float = 2500.0,
    lam_hi_aa: float = 12000.0,
    seed: int = 20240817,
    include_molecules: bool = True,
) -> dict:
    """Kurucz-scale logical frames in the carsus schema.

    Returns the dict consumed by ``convert.convert_frames``: atom_data /
    ionization_data / levels / lines / linelist_atoms (+ molecule tables).
    """
    rng = np.random.default_rng(seed)
    zs = [z for z in range(1, z_max + 1) if z in NIST_IONIZATION_EV]

    atom_data = pd.DataFrame(
        {
            "symbol": [ELEMENT_SYMBOLS[z - 1] for z in zs],
            "name": [ELEMENT_SYMBOLS[z - 1].lower() for z in zs],
            "mass": [ATOMIC_WEIGHTS_AMU[z] for z in zs],  # u (carsus)
        },
        index=pd.Index(zs, name="atomic_number"),
    )

    ion_idx, ion_val = [], []
    for z in zs:
        for stage, chi in enumerate(NIST_IONIZATION_EV[z], start=1):
            ion_idx.append((z, stage))
            ion_val.append(chi)  # eV (carsus)
    ionization_data = pd.Series(
        ion_val,
        index=pd.MultiIndex.from_tuples(
            ion_idx, names=["atomic_number", "ion_number"]
        ),
        name="ionization_energy",
    )

    # ---- levels: ground (real g) + synthetic ladder filling (0, 0.97chi)
    lev_rows = []
    level_bank = {}  # (z, ion) -> (energies_ev [K], gs [K])
    for z in zs:
        n_stages = len(NIST_IONIZATION_EV[z])
        gs = GROUND_G.get(z, [1, 1, 1])
        for ion in range(min(n_stages, 3)):
            chi = NIST_IONIZATION_EV[z][ion]
            count = max(8, int(levels_per_ion // (1 + ion)))
            e_exc = np.sort(
                rng.uniform(0.05 * chi, 0.97 * chi, count - 1)
            )
            energies = np.concatenate([[0.0], e_exc])
            g_ground = gs[ion] if ion < len(gs) else 1
            g_exc = 2.0 * rng.integers(0, 7, count - 1) + rng.choice(
                [1.0, 2.0], count - 1
            )
            g = np.concatenate([[float(g_ground)], g_exc])
            level_bank[(z, ion)] = (energies, g)
            for num, (e, gg) in enumerate(zip(energies, g)):
                lev_rows.append((z, ion, num, e, gg, num == 0))
        # ground level of the next (data-less) stage closes the Saha chain
        top = min(n_stages, 3)
        lev_rows.append((z, top, 0, 0.0, 1.0, True))
    levels = pd.DataFrame(
        [(e, g, m) for *_i, e, g, m in lev_rows],
        columns=["energy", "g", "metastable"],
        index=pd.MultiIndex.from_tuples(
            [(z, i, n) for z, i, n, *_r in lev_rows],
            names=["atomic_number", "ion_number", "level_number"],
        ),
    )

    # ---- lines: transitions between actual level pairs, lambda in range
    hc_ev_aa = 12398.419843320025  # h*c [eV*AA]
    e_lo_max = hc_ev_aa / lam_lo_aa  # widest transition energy [eV]

    keys = list(level_bank.keys())
    # weight species by a kurucz-like line richness: Fe-group dominates
    richness = np.array(
        [10.0 if 21 <= z <= 28 else (3.0 if z >= 11 else 1.0)
         for z, _ion in keys]
    )
    weights = richness / richness.sum()

    cols = {
        "atomic_number": [], "ion_number": [],
        "level_number_lower": [], "level_number_upper": [],
        "wavelength": [], "gf": [],
    }
    batch = max(4096, n_lines // 8)
    while len(cols["wavelength"]) < n_lines:
        picks = rng.choice(len(keys), size=batch, p=weights)
        for k in np.unique(picks):
            z, ion = keys[k]
            energies, g = level_bank[(z, ion)]
            m = int((picks == k).sum())
            lo = rng.integers(0, max(1, len(energies) - 1), m)
            up = rng.integers(0, len(energies), m)
            e_lo_ev = energies[lo]
            e_up_ev = energies[up]
            de = e_up_ev - e_lo_ev
            lam = np.where(de > 0, hc_ev_aa / np.where(de > 0, de, 1.0), 0.0)
            ok = (de > 0) & (lam >= lam_lo_aa) & (lam <= lam_hi_aa)
            if not ok.any():
                continue
            cols["atomic_number"].extend([z] * int(ok.sum()))
            cols["ion_number"].extend([ion] * int(ok.sum()))
            cols["level_number_lower"].extend(lo[ok].tolist())
            cols["level_number_upper"].extend(up[ok].tolist())
            cols["wavelength"].extend(lam[ok].tolist())
            gf = g[lo[ok]] * 10.0 ** rng.uniform(-7.0, 0.5, int(ok.sum()))
            cols["gf"].extend(gf.tolist())
        _ = e_lo_max  # documented bound; the lam filter enforces it
    lines = pd.DataFrame(cols).iloc[:n_lines].reset_index(drop=True)
    lines.index.name = "line_id"

    # ---- VALD long-form linelist from a subset of the same transitions
    n_vald = min(n_vald_lines, len(lines))
    sub = lines.iloc[
        rng.choice(len(lines), size=n_vald, replace=False)
    ].reset_index(drop=True)
    e_low_ev, e_up_ev, j_lo, j_up = [], [], [], []
    for z, ion, lo, up in zip(
        sub.atomic_number, sub.ion_number,
        sub.level_number_lower, sub.level_number_upper,
    ):
        energies, g = level_bank[(z, ion)]
        e_low_ev.append(energies[lo])
        e_up_ev.append(energies[up])
        j_lo.append((g[lo] - 1.0) / 2.0)
        j_up.append((g[up] - 1.0) / 2.0)
    # broadening parameters in VALD conventions: log10(gamma_rad),
    # log10(gamma_stark/n_e at 1e4 K), and the packed vdW column mixing
    # the three reference dispatch branches (scaled / Unsoeld / ABO)
    vdw_kind = rng.choice([0, 1, 2], size=n_vald, p=[0.6, 0.2, 0.2])
    waals = np.where(
        vdw_kind == 0,
        rng.uniform(-8.0, -7.0, n_vald),  # scaled 10^vdW branch
        np.where(
            vdw_kind == 1,
            np.where(rng.uniform(size=n_vald) < 0.5, 0.0,
                     rng.uniform(1.0, 3.0, n_vald)),  # zero / Unsoeld
            rng.integers(200, 1200, n_vald)
            + rng.uniform(0.2, 0.4, n_vald),  # ABO packed sigma.alpha
        ),
    )
    linelist_atoms = pd.DataFrame(
        {
            "atomic_number": sub.atomic_number.astype(int),
            "ion_charge": sub.ion_number.astype(int),
            "wavelength": sub.wavelength.astype(float),
            "log_gf": np.log10(sub.gf.astype(float)),
            "e_low": np.asarray(e_low_ev),
            "e_up": np.asarray(e_up_ev),
            "j_lo": np.asarray(j_lo),
            "j_up": np.asarray(j_up),
            "rad": rng.uniform(6.5, 9.0, n_vald),
            "stark": rng.uniform(-7.5, -4.5, n_vald),
            "waals": waals,
        }
    )

    frames = {
        "atom_data": atom_data,
        "ionization_data": ionization_data,
        "levels": levels,
        "lines": lines,
        "linelist_atoms": linelist_atoms,
    }
    if include_molecules:
        from stardis_tpu.atom_data.builtin import build_demo_molecule_data

        md = build_demo_molecule_data()
        frames["molecule_eq"] = md.equilibrium_constants
        frames["molecule_pf"] = md.partition_functions
        frames["molecule_de"] = md.dissociation_energies
    return frames


# ----------------------------------------------------------------------
# pandas fixed-format HDF5 writer/reader (h5py, no pytables)
# ----------------------------------------------------------------------

def _to_bytes(x):
    return np.array([str(v).encode() for v in x], dtype="S32")


def _kind_of(values):
    k = np.asarray(values).dtype.kind
    return {
        "i": b"integer", "u": b"integer", "f": b"float",
        "b": b"bool", "S": b"string", "U": b"string", "O": b"string",
    }.get(k, b"string")


def _encode(values):
    values = np.asarray(values)
    if values.dtype.kind in ("U", "O"):
        return _to_bytes(values)
    return values


def _write_index(grp, name, index):
    if isinstance(index, pd.MultiIndex):
        grp.attrs[f"{name}_variety"] = b"multi"
        grp.attrs[f"{name}_nlevels"] = index.nlevels
        for i in range(index.nlevels):
            lev = np.asarray(index.levels[i].values)
            ds = grp.create_dataset(f"{name}_level{i}", data=_encode(lev))
            ds.attrs["kind"] = _kind_of(lev)
            ds.attrs["name"] = str(index.names[i] or f"level_{i}").encode()
            lab = grp.create_dataset(
                f"{name}_label{i}",
                data=np.asarray(index.codes[i], dtype=np.int64),
            )
            lab.attrs["kind"] = b"integer"
    else:
        grp.attrs[f"{name}_variety"] = b"regular"
        vals = np.asarray(index.values)
        ds = grp.create_dataset(name, data=_encode(vals))
        ds.attrs["kind"] = _kind_of(vals)
        if index.name is not None:
            ds.attrs["name"] = str(index.name).encode()


def _write_frame(f, key, df):
    grp = f.create_group(key)
    grp.attrs["pandas_type"] = b"frame"
    grp.attrs["pandas_version"] = b"0.15.2"
    grp.attrs["encoding"] = b"UTF-8"
    grp.attrs["errors"] = b"strict"
    grp.attrs["ndim"] = 2
    _write_index(grp, "axis0", df.columns)
    _write_index(grp, "axis1", df.index)
    # one block per dtype family, mirroring the pandas block manager
    fams = {}
    for col in df.columns:
        k = df[col].dtype.kind
        fam = {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(
            k, "string"
        )
        fams.setdefault(fam, []).append(col)
    grp.attrs["nblocks"] = len(fams)
    for i, (fam, cols) in enumerate(sorted(fams.items())):
        # preserve the column-name dtype (molecule tables use float
        # temperature columns) so reader keys match axis0
        items = grp.create_dataset(
            f"block{i}_items", data=_encode(np.asarray(cols))
        )
        items.attrs["kind"] = _kind_of(np.asarray(cols))
        if fam == "string":
            arr = np.stack([_to_bytes(df[c].values) for c in cols])
        else:
            arr = np.stack([np.asarray(df[c].values) for c in cols])
        vals = grp.create_dataset(f"block{i}_values", data=arr)
        vals.attrs["transposed"] = True


def _write_series(f, key, s):
    grp = f.create_group(key)
    grp.attrs["pandas_type"] = b"series"
    grp.attrs["pandas_version"] = b"0.15.2"
    grp.attrs["encoding"] = b"UTF-8"
    grp.attrs["errors"] = b"strict"
    _write_index(grp, "index", s.index)
    ds = grp.create_dataset("values", data=_encode(np.asarray(s.values)))
    ds.attrs["kind"] = _kind_of(s.values)
    if s.name is not None:
        ds.attrs["name"] = str(s.name).encode()


def write_store(frames: dict, path, key_map=None):
    """Write logical frames as a pandas-fixed-format HDF5 store (h5py).

    key_map overrides the store key per logical name; defaults follow the
    carsus layout (molecules under ``molecules/``)."""
    import h5py

    default_keys = {
        "atom_data": "atom_data",
        "ionization_data": "ionization_data",
        "levels": "levels",
        "lines": "lines",
        "linelist_atoms": "linelist_atoms",
        "linelist_molecules": "linelist_molecules",
        "molecule_eq": "molecules/equilibrium_constants",
        "molecule_pf": "molecules/partition_functions",
        "molecule_de": "molecules/dissociation_energies",
    }
    keys = dict(default_keys, **(key_map or {}))
    with h5py.File(path, "w") as f:
        for logical, obj in frames.items():
            key = keys.get(logical, logical)
            if isinstance(obj, pd.Series):
                _write_series(f, key, obj)
            else:
                _write_frame(f, key, obj)


def _attr_str(obj, name, default=None):
    v = obj.attrs.get(name, default)
    if isinstance(v, bytes):
        return v.decode()
    return v


def _decode(values):
    values = np.asarray(values)
    if values.dtype.kind == "S":
        return np.array([v.decode() for v in values])
    return values


def _read_index(grp, name):
    variety = _attr_str(grp, f"{name}_variety", "regular")
    if variety == "multi":
        n = int(grp.attrs[f"{name}_nlevels"])
        levels, codes, names = [], [], []
        for i in range(n):
            ds = grp[f"{name}_level{i}"]
            levels.append(_decode(ds[...]))
            names.append(_attr_str(ds, "name"))
            codes.append(np.asarray(grp[f"{name}_label{i}"][...], np.int64))
        return pd.MultiIndex(
            levels=[pd.Index(lv) for lv in levels], codes=codes, names=names
        )
    ds = grp[name]
    return pd.Index(_decode(ds[...]), name=_attr_str(ds, "name"))


def read_store_group(grp):
    """Reconstruct a DataFrame/Series from one pandas-fixed-format group."""
    ptype = _attr_str(grp, "pandas_type")
    if ptype == "series":
        idx = _read_index(grp, "index")
        ds = grp["values"]
        return pd.Series(_decode(ds[...]), index=idx,
                         name=_attr_str(ds, "name"))
    if ptype != "frame":
        raise ValueError(
            f"unsupported pandas_type {ptype!r} (fixed-format frames/series"
            " here; table-format groups route to atom_data.table_format)"
        )
    cols_order = _read_index(grp, "axis0")
    idx = _read_index(grp, "axis1")
    data = {}
    for i in range(int(grp.attrs["nblocks"])):
        items = _decode(grp[f"block{i}_items"][...])
        vals = grp[f"block{i}_values"][...]
        if vals.ndim == 1:
            vals = vals.reshape(1, -1)
        for j, c in enumerate(items):
            data[c] = _decode(vals[j])
    df = pd.DataFrame(data, index=idx)
    return df[[c for c in np.asarray(cols_order)]]


def read_fixed_store(path) -> dict:
    """h5py fallback for convert.load_carsus_store: read every pandas
    HDFStore group keyed by its store path — ``fixed``-format groups via
    read_store_group, ``table``-format (pytables Table) groups via
    atom_data.table_format.read_table_group.  Mixed stores are fine; real
    carsus files ship in both formats depending on the pandas writer."""
    import h5py

    from stardis_tpu.atom_data.table_format import (
        is_table_group,
        read_table_group,
    )

    out = {}

    def visit(name, obj):
        import h5py as _h5

        if isinstance(obj, _h5.Group) and "pandas_type" in obj.attrs:
            if is_table_group(obj):
                out[name] = read_table_group(obj)
            else:
                out[name] = read_store_group(obj)
            return None
        return None

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) not in (1, 2):
        print(
            "usage: python -m stardis_tpu.atom_data.synthetic_carsus "
            "<out.h5> [n_lines]",
            file=sys.stderr,
        )
        return 2
    n_lines = int(argv[1]) if len(argv) == 2 else 150_000
    frames = build_carsus_frames(n_lines=n_lines)
    write_store(frames, argv[0])
    print(
        f"wrote carsus-format store {argv[0]}: "
        f"{len(frames['atom_data'])} elements, {len(frames['levels'])} "
        f"levels, {len(frames['lines'])} lines, "
        f"{len(frames['linelist_atoms'])} VALD lines"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
