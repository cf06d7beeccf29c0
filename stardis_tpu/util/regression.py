"""Golden-file regression framework.

Mirrors the reference's RegressionData plugin
(stardis/util/regression_data.py:12-165): each sync_* call either writes the
value to the regression directory (generate mode) or loads and compares
(test mode).  Storage is .npz via NumPy instead of pytables HDF.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class RegressionData:
    def __init__(self, base_dir, key, generate=False, rtol=1e-7, atol=0.0):
        self.base_dir = Path(base_dir)
        self.key = key
        self.generate = generate
        self.rtol = rtol
        self.atol = atol
        self.fpath = self.base_dir / f"{key}.npz"
        self._store = {}
        if not generate:
            if not self.fpath.exists():
                raise FileNotFoundError(
                    f"regression data {self.fpath} missing; run with "
                    "--generate-reference first"
                )
            self._store = dict(np.load(self.fpath, allow_pickle=False))

    def sync_ndarray(self, name, value):
        value = np.asarray(value)
        if self.generate:
            self._store[name] = value
            return value
        expected = self._store[name]
        np.testing.assert_allclose(
            value, expected, rtol=self.rtol, atol=self.atol,
            err_msg=f"regression mismatch for {self.key}/{name}",
        )
        return expected

    def sync_scalar(self, name, value):
        return self.sync_ndarray(name, np.asarray(value))

    def flush(self):
        if self.generate:
            self.base_dir.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(self.fpath, **self._store)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.flush()
        return False
