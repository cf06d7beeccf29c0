"""carsus/TARDIS pytables atom-data -> stardis_tpu native HDF5 converter.

The reference consumes ``kurucz_cd23_chianti_H_He.h5`` (a pandas/pytables
HDFStore written by carsus; reference io/base.py:67, conftest.py:60-62).
stardis_tpu stores atom data in a plain h5py layout (atom_data/base.py) so
the runtime does not depend on the ``tables`` package.  This module bridges
the two: run it wherever pytables IS installed, ship the converted file.

    python -m stardis_tpu.atom_data.convert kurucz_cd23.h5 native.h5

Field mapping (carsus store key -> native table, with unit conversions):

    /atom_data            symbol, mass [u]      -> mass [g] (x AMU)
    /ionization_data      ionization_energy [eV]-> [erg]
    /levels               energy [eV], g,       -> energy [erg]
                          metastable
    /lines                wavelength [AA], f_lu -> nu [Hz], f_lu, A_ul [1/s],
                          (A_ul or gf variants)    wavelength_cm
    /linelist_atoms       VALD long/short form  -> passed through unchanged
    /linelist_molecules                            (AA / eV / log-gamma cols,
                                                   reference plasma/base.py:216-232)
    /molecules/equilibrium_constants  log10 Kp [Pa] vs T -> MoleculeData
    /molecules/partition_functions    U vs T
    /molecules/dissociation_energies  Ion1/Ion2 + D0 [eV]

The store-reading shell requires pytables; the frame mapping itself is pure
pandas and unit-tested without it (tests/test_convert.py).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

from stardis_tpu.constants import AMU_CGS, C_CGS, EV_TO_ERG
from stardis_tpu.atom_data.base import (
    AtomData,
    MoleculeData,
    einstein_a_from_f_lu,
)

#: HDFStore keys probed for each logical table (first hit wins) — carsus
#: has shuffled a few of these across versions.
KEY_ALIASES = {
    "atom_data": ("atom_data", "atom_masses", "basic_atom_data"),
    "ionization_data": ("ionization_data",),
    "levels": ("levels", "levels_data"),
    "lines": ("lines", "lines_data"),
    "linelist_atoms": ("linelist_atoms",),
    "linelist_molecules": ("linelist_molecules",),
    "molecule_eq": (
        "molecules/equilibrium_constants",
        "molecule_data/equilibrium_constants",
    ),
    "molecule_pf": (
        "molecules/partition_functions",
        "molecule_data/partition_functions",
    ),
    "molecule_de": (
        "molecules/dissociation_energies",
        "molecule_data/dissociation_energies",
    ),
}


def convert_frames(frames: dict) -> AtomData:
    """Map carsus-schema DataFrames to a native AtomData (pure pandas).

    ``frames`` keys follow KEY_ALIASES' logical names; only ``atom_data``,
    ``ionization_data`` and ``levels`` are required.
    """
    atoms = frames["atom_data"].copy()
    if "symbol" not in atoms.columns:
        raise ValueError("atom_data table lacks a 'symbol' column")
    if "mass" not in atoms.columns:
        raise ValueError("atom_data table lacks a 'mass' column")
    atoms.index = atoms.index.astype(int)
    atoms.index.name = "atomic_number"
    # carsus masses are in u; anything above ~1e-10 is clearly not grams
    mass = atoms["mass"].astype(float)
    if mass.max() > 1e-10:
        mass = mass * AMU_CGS
    atom_data = pd.DataFrame({"symbol": atoms["symbol"], "mass": mass})

    ion = frames["ionization_data"]
    if isinstance(ion, pd.DataFrame):
        ion = ion["ionization_energy"]
    ion = ion.astype(float)
    # carsus stores eV; erg values would be < 1e-9
    if ion.max() > 1e-6:
        ion = ion * EV_TO_ERG
    ion.name = "ionization_energy"
    ion.index = ion.index.set_names(["atomic_number", "ion_number"])

    levels = frames["levels"].copy()
    for col in ("energy", "g"):
        if col not in levels.columns:
            raise ValueError(f"levels table lacks a '{col}' column")
    energy = levels["energy"].astype(float)
    if np.nanmax(np.abs(energy.values)) > 1e-6:
        energy = energy * EV_TO_ERG
    if "metastable" not in levels.columns:
        levels["metastable"] = False
    levels = pd.DataFrame(
        {
            "energy": energy,
            "g": levels["g"].astype(float),
            "metastable": levels["metastable"].astype(bool),
        },
        index=levels.index.set_names(
            ["atomic_number", "ion_number", "level_number"]
        ),
    )

    lines_src = frames.get("lines")
    if lines_src is not None and len(lines_src):
        lines = lines_src.reset_index()
        # wavelength: carsus 'wavelength' is AA (kurucz) — accept
        # wavelength_cm directly when present
        if "wavelength_cm" in lines.columns:
            wl_cm = lines["wavelength_cm"].astype(float)
        else:
            wl_cm = lines["wavelength"].astype(float) * 1e-8
        nu = lines["nu"] if "nu" in lines.columns else C_CGS / wl_cm
        if "f_lu" in lines.columns:
            f_lu = lines["f_lu"].astype(float)
        elif "gf" in lines.columns:
            g_lo = _level_g(
                levels, lines, "level_number_lower"
            )
            f_lu = lines["gf"].astype(float) / g_lo
        else:
            raise ValueError("lines table lacks f_lu/gf columns")
        if "A_ul" in lines.columns:
            a_ul = lines["A_ul"].astype(float)
        else:
            g_lo = _level_g(levels, lines, "level_number_lower")
            g_up = _level_g(levels, lines, "level_number_upper")
            a_ul = einstein_a_from_f_lu(np.asarray(nu), g_lo, g_up, f_lu)
        lines = pd.DataFrame(
            {
                "atomic_number": lines["atomic_number"].astype(int),
                "ion_number": lines["ion_number"].astype(int),
                "level_number_lower": lines["level_number_lower"].astype(int),
                "level_number_upper": lines["level_number_upper"].astype(int),
                "nu": np.asarray(nu, dtype=float),
                "f_lu": np.asarray(f_lu, dtype=float),
                "A_ul": np.asarray(a_ul, dtype=float),
                "wavelength_cm": np.asarray(wl_cm, dtype=float),
            }
        )
        lines.index.name = "line_id"
    else:
        lines = pd.DataFrame(
            columns=[
                "atomic_number", "ion_number", "level_number_lower",
                "level_number_upper", "nu", "f_lu", "A_ul", "wavelength_cm",
            ]
        )

    def passthrough(name):
        ll = frames.get(name)
        if ll is None:
            return None
        return ll.reset_index(drop=True)

    molecule_data = None
    if frames.get("molecule_eq") is not None:
        molecule_data = MoleculeData(
            frames["molecule_eq"],
            frames["molecule_pf"],
            frames["molecule_de"],
        )

    return AtomData(
        atom_data,
        ion,
        levels,
        lines,
        linelist_atoms=passthrough("linelist_atoms"),
        linelist_molecules=passthrough("linelist_molecules"),
        molecule_data=molecule_data,
    )


def _level_g(levels, lines, level_col):
    idx = pd.MultiIndex.from_arrays(
        [
            lines["atomic_number"].astype(int),
            lines["ion_number"].astype(int),
            lines[level_col].astype(int),
        ]
    )
    return levels["g"].reindex(idx).values


def load_carsus_store(path) -> dict:
    """Read a carsus store into the logical-frame dict.

    Prefers the pytables reader when the ``tables`` package is installed;
    otherwise falls back to the h5py readers, which decode BOTH pandas
    HDFStore layouts: ``format="fixed"`` groups
    (atom_data/synthetic_carsus.py) and ``format="table"`` pytables-Table
    groups (atom_data/table_format.py, globals-free attr unpickling), so
    a real carsus store converts regardless of which pandas writer
    produced it."""
    try:
        import tables  # noqa: F401

        have_pytables = True
    except ImportError:
        have_pytables = False

    if have_pytables:
        raw = {}
        with pd.HDFStore(path, "r") as store:
            raw = {k.lstrip("/"): store[k] for k in store.keys()}
    else:
        from stardis_tpu.atom_data.synthetic_carsus import read_fixed_store

        raw = read_fixed_store(path)

    keys = set(raw)
    frames = {}
    for logical, aliases in KEY_ALIASES.items():
        for alias in aliases:
            if alias in keys:
                frames[logical] = raw[alias]
                break
    missing = [k for k in ("atom_data", "ionization_data", "levels")
               if k not in frames]
    if missing:
        raise ValueError(
            f"{path}: carsus store lacks required tables {missing}; "
            f"found keys {sorted(keys)}"
        )
    return frames


def convert(src_path, dst_path) -> AtomData:
    """carsus pytables file -> native h5py file; returns the AtomData."""
    adata = convert_frames(load_carsus_store(src_path))
    adata.to_hdf(dst_path)
    return adata


def verify_report(adata: AtomData) -> dict:
    """Per-species inventory + value checksums of a converted store.

    The report is the converter's auditable fingerprint: level/line
    counts per (Z, ion), float checksums over the physical columns
    (energies, f_lu, nu — sensitive to any unit-conversion mistake),
    and headline ionization energies / masses in the ORIGINAL units
    (eV / u) so they can be eyeballed against published values.
    """
    levels = adata.levels
    lines = adata.lines
    lvl_counts = (
        levels.groupby(level=["atomic_number", "ion_number"]).size()
        if len(levels)
        else pd.Series(dtype=int)
    )
    line_counts = (
        lines.groupby(["atomic_number", "ion_number"]).size()
        if len(lines)
        else pd.Series(dtype=int)
    )
    report = {
        "n_elements": int(len(adata.atom_data)),
        "z_min": int(adata.atom_data.index.min()),
        "z_max": int(adata.atom_data.index.max()),
        "n_levels": int(len(levels)),
        "n_lines": int(len(lines)),
        "n_linelist_atoms": (
            0 if adata.linelist_atoms is None else int(len(adata.linelist_atoms))
        ),
        "n_linelist_molecules": (
            0
            if adata.linelist_molecules is None
            else int(len(adata.linelist_molecules))
        ),
        "has_molecule_data": adata.molecule_data is not None,
        "levels_per_species": {
            f"{z}_{i}": int(n) for (z, i), n in lvl_counts.items()
        },
        "lines_per_species": {
            f"{z}_{i}": int(n) for (z, i), n in line_counts.items()
        },
        # unit-conversion-sensitive checksums (native cgs columns)
        "checksum_level_energy_erg": float(levels["energy"].sum())
        if len(levels) else 0.0,
        "checksum_level_g": float(levels["g"].sum()) if len(levels) else 0.0,
        "checksum_f_lu": float(lines["f_lu"].sum()) if len(lines) else 0.0,
        "checksum_nu_hz": float(lines["nu"].sum()) if len(lines) else 0.0,
        # headline values in ORIGINAL units for eyeball checks
        "ionization_ev": {
            f"{z}_{i}": round(float(chi) / EV_TO_ERG, 4)
            for (z, i), chi in adata.ionization_data.items()
            if (z, i) in ((1, 1), (2, 1), (2, 2), (26, 1), (26, 2))
        },
        "mass_u": {
            str(z): round(float(m) / AMU_CGS, 4)
            for z, m in adata.atom_data["mass"].items()
            if z in (1, 2, 26)
        },
    }
    return report


def verify_against_expected(report: dict, expected: dict) -> list:
    """Compare a verify_report against a committed expectation table.

    Returns a list of human-readable failure strings (empty = pass).
    Supports two kinds of expectation:

    * structural pins that carsus documentation states outright
      (``z_range``, ``ionization_ev`` with ``tol_ev``, ``mass_u`` with
      ``tol_u``, ``totals`` {key: [lo, hi]} count ranges);
    * an optional ``exact`` block (full per-species counts + checksums)
      recorded by ``--record`` from the first verified conversion of a
      genuine store — absent until that day, binding afterwards.
    """
    fails = []
    zr = expected.get("z_range")
    if zr and not (report["z_min"] == zr[0] and report["z_max"] == zr[1]):
        fails.append(
            f"element range {report['z_min']}..{report['z_max']} != "
            f"expected {zr[0]}..{zr[1]}"
        )
    tol_ev = float(expected.get("tol_ev", 0.01))
    for key, val in (expected.get("ionization_ev") or {}).items():
        got = report["ionization_ev"].get(key)
        if got is None or abs(got - val) > tol_ev:
            fails.append(
                f"ionization {key}: {got} eV != expected {val} +- {tol_ev}"
            )
    tol_u = float(expected.get("tol_u", 0.001))
    for key, val in (expected.get("mass_u") or {}).items():
        got = report["mass_u"].get(key)
        if got is None or abs(got - val) > tol_u:
            fails.append(f"mass Z={key}: {got} u != expected {val} +- {tol_u}")
    for key, (lo, hi) in (expected.get("totals") or {}).items():
        got = report.get(key)
        if got is None or not (lo <= got <= hi):
            fails.append(f"{key}: {got} outside expected [{lo}, {hi}]")
    exact = expected.get("exact")
    if exact:
        for key, val in exact.items():
            got = report.get(key)
            if isinstance(val, float):
                ok = got is not None and (
                    abs(got - val) <= 1e-9 * max(abs(val), 1.0)
                )
            else:
                ok = got == val
            if not ok:
                fails.append(f"exact.{key}: {got!r} != recorded {val!r}")
    return fails


def _builtin_expected(src_path):
    """Bundled expectation table matching the source file's basename
    (currently: kurucz_cd23_chianti_H_He)."""
    import json
    from pathlib import Path

    stem = Path(src_path).name
    for name in ("kurucz_cd23_chianti_H_He",):
        if name in stem:
            p = Path(__file__).parent / "expected_counts" / f"{name}.json"
            if p.exists():
                return json.loads(p.read_text())
    return None


def main(argv=None):
    import argparse
    import json

    parser = argparse.ArgumentParser(
        prog="python -m stardis_tpu.atom_data.convert",
        description="carsus/TARDIS pytables atom data -> native HDF5",
    )
    parser.add_argument("src", help="carsus store (pandas HDFStore)")
    parser.add_argument("dst", help="native output path")
    parser.add_argument(
        "--verify", action="store_true",
        help="print the per-species verification report and, when an "
        "expectation table exists (bundled by store name, or --expected), "
        "fail on any mismatch",
    )
    parser.add_argument(
        "--expected", metavar="JSON",
        help="expectation table to verify against (overrides the bundled "
        "one)",
    )
    parser.add_argument(
        "--record", metavar="JSON",
        help="write the full report as an 'exact' expectation table — run "
        "once against a genuine store to pin its counts/checksums",
    )
    args = parser.parse_args(argv)

    adata = convert(args.src, args.dst)
    print(
        f"converted: {len(adata.atom_data)} elements, "
        f"{len(adata.levels)} levels, {len(adata.lines)} lines, "
        f"linelist_atoms="
        f"{0 if adata.linelist_atoms is None else len(adata.linelist_atoms)}"
    )
    if not (args.verify or args.record):
        return 0

    report = verify_report(adata)
    print(json.dumps(report, indent=1, sort_keys=True))
    if args.record:
        with open(args.record, "w") as fh:
            json.dump(
                {"recorded_from": str(args.src), "exact": report},
                fh, indent=1, sort_keys=True,
            )
        print(f"recorded expectation table -> {args.record}")
    if args.verify:
        expected = None
        if args.expected:
            with open(args.expected) as fh:
                expected = json.load(fh)
        else:
            expected = _builtin_expected(args.src)
        if expected is None:
            print("verify: no expectation table for this store "
                  "(report printed above)")
            return 0
        fails = verify_against_expected(report, expected)
        if fails:
            for f in fails:
                print(f"VERIFY FAIL: {f}", file=sys.stderr)
            return 1
        print(f"verify: PASSED {expected.get('name', '(table)')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
