"""Native (C++) host-side components.

The compute path is JAX/XLA/Pallas; the runtime around it uses native code
where the host would otherwise bottleneck.  Currently: a VALD linelist text
parser (multi-GB VALD exports parse ~100x faster than a Python loop).

The shared library builds on first use with g++ (-O3) and is cached next to
the source; a pure-Python fallback parser keeps the feature available if no
compiler is present.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "vald_parser.cpp"
_LIB = Path(__file__).parent / "_vald_parser.so"
_lib_handle = None


def _build_library():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load_library():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build_library()
    lib = ctypes.CDLL(str(_LIB))
    lib.vald_count_lines.argtypes = [ctypes.c_char_p]
    lib.vald_count_lines.restype = ctypes.c_int
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    lib.vald_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ip, ip,
        dp, dp, dp, dp, dp, dp, dp, dp, dp,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vald_parse.restype = ctypes.c_int
    _lib_handle = lib
    return lib


def read_vald_linelist(path, use_native=True):
    """Parse a VALD3 text export (long or shortlist format) into the
    linelist_atoms DataFrame layout consumed by the line pipeline.

    Returns (DataFrame, is_shortlist).
    """
    path = str(path)
    if use_native:
        try:
            return _read_native(path)
        except Exception as exc:  # compiler missing, unreadable, ...
            logger.warning(
                "native VALD parser unavailable (%s); using Python fallback",
                exc,
            )
    return _read_python(path)


def _read_native(path):
    lib = _load_library()
    cap = lib.vald_count_lines(path.encode())
    if cap < 0:
        raise IOError(f"cannot read {path}")
    cap = max(cap, 1)
    z = np.empty(cap, np.int32)
    q = np.empty(cap, np.int32)
    cols = [np.empty(cap, np.float64) for _ in range(9)]
    short_flag = ctypes.c_int(0)
    n = lib.vald_parse(path.encode(), cap, z, q, *cols, ctypes.byref(short_flag))
    if n < 0:
        raise IOError(f"cannot read {path}")
    wl, lgf, e_lo, j_lo, e_up, j_up, rad, stark, waals = (c[:n] for c in cols)
    frame = pd.DataFrame(
        {
            "atomic_number": z[:n].astype(np.int64),
            "ion_charge": q[:n].astype(np.int64),
            "wavelength": wl,
            "log_gf": lgf,
            "e_low": e_lo,
            "j_lo": j_lo,
            "e_up": e_up,
            "j_up": j_up,
            "rad": rad,
            "stark": stark,
            "waals": waals,
        }
    )
    is_short = bool(short_flag.value)
    if is_short:
        frame = frame.drop(columns=["j_lo", "e_up", "j_up"])
    return frame, is_short


def _read_python(path):
    """Pure-Python fallback with the same semantics as the C++ parser."""
    import re

    from stardis_tpu.util.species import SYMBOL_TO_Z

    rows = []
    shortlist_votes = longlist_votes = 0
    spec_re = re.compile(r"^\s*'([A-Z][a-z]?)\s+(\d+)'")
    with open(path) as fh:
        for line in fh:
            m = spec_re.match(line)
            if not m:
                continue
            sym, ion = m.group(1), int(m.group(2))
            if sym not in SYMBOL_TO_Z or not (1 <= ion <= 30):
                continue
            rest = line[m.end():]
            vals = []
            for tok in rest.split(","):
                tok = tok.strip()
                if not tok:
                    continue
                try:
                    vals.append(float(tok))
                except ValueError:
                    break
            if len(vals) < 4:
                continue
            z, q = SYMBOL_TO_Z[sym], ion - 1
            if len(vals) >= 9:
                rows.append(
                    (z, q, vals[0], vals[1], vals[2], vals[3], vals[4],
                     vals[5], vals[-3], vals[-2], vals[-1])
                )
                longlist_votes += 1
            else:
                rows.append(
                    (z, q, vals[0], vals[2], vals[1], -1.0, -1.0, -1.0,
                     vals[3] if len(vals) > 3 else 0.0,
                     vals[4] if len(vals) > 4 else 0.0,
                     vals[5] if len(vals) > 5 else 0.0)
                )
                shortlist_votes += 1
    frame = pd.DataFrame(
        rows,
        columns=[
            "atomic_number", "ion_charge", "wavelength", "log_gf", "e_low",
            "j_lo", "e_up", "j_up", "rad", "stark", "waals",
        ],
    )
    is_short = shortlist_votes > longlist_votes
    if is_short:
        frame = frame.drop(columns=["j_lo", "e_up", "j_up"])
    return frame, is_short
