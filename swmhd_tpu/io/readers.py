"""Readback utilities — the FieldTimeSeries analog.

The reference post-processes via
``FieldTimeSeries(file, "s")`` with ``.times`` and per-snapshot indexing
(jacobian_formulation/SWMHD_example.jl:106-113); these readers do the same
over the :mod:`swmhd_tpu.io.writers` stores.
"""

from __future__ import annotations

import csv
import json
import os

import numpy as np


class FieldTimeSeries:
    def __init__(self, path: str, name: str):
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        self.times = np.asarray(meta["times"])
        self.iterations = np.asarray(meta["iterations"])
        self.grid_meta = meta.get("grid")
        self._dir = os.path.join(path, name)
        self._n = len(self.times)

    def __len__(self):
        return self._n

    def __getitem__(self, i: int) -> np.ndarray:
        if i < 0:
            i += self._n
        import glob
        single = os.path.join(self._dir, f"{i:06d}.npy")
        # pod-scale snapshots are per-process slabs written by
        # FieldWriter._write_array (one .p<pid>.npz per process, each
        # carrying its global bounds — no gather happened at write time)
        slabs = sorted(glob.glob(os.path.join(self._dir,
                                              f"{i:06d}.p*.npz")))
        if os.path.exists(single):
            if slabs:
                raise RuntimeError(
                    f"snapshot {i:06d} exists BOTH as a single .npy and "
                    f"as per-process slabs in {self._dir} — mixed "
                    f"single-process and pod writes into one store; "
                    f"refusing to guess which run's data to serve")
            return np.load(single)
        if not slabs:
            raise FileNotFoundError(
                f"no snapshot {i:06d} (neither .npy nor .p*.npz) in "
                f"{self._dir}")
        out = None
        filled = 0
        for path in slabs:
            with np.load(path) as z:
                x0, x1, y0, y1 = (int(b) for b in z["bounds"])
                if out is None:
                    out = np.empty(tuple(int(s) for s in z["shape"]),
                                   dtype=z["data"].dtype)
                out[x0:x1, y0:y1] = z["data"]
                filled += (x1 - x0) * (y1 - y0)
        if filled != out.size:
            raise RuntimeError(
                f"snapshot {i:06d}: slabs cover {filled} of {out.size} "
                f"points — incomplete pod write")
        return out

    def stack(self) -> np.ndarray:
        """(T, Nx, Ny) array of all snapshots."""
        return np.stack([self[i] for i in range(self._n)])


class ScalarTimeSeries:
    """Columns of a ScalarWriter CSV as numpy arrays (attribute access)."""

    def __init__(self, path: str):
        with open(path, newline="") as f:
            rows = list(csv.reader(f))
        header, data = rows[0], rows[1:]
        cols = {name: np.asarray([float(r[i]) for r in data])
                for i, name in enumerate(header)}
        self.columns = cols

    def __getattr__(self, name):
        try:
            return self.columns[name]
        except KeyError:
            raise AttributeError(name)

    def __getitem__(self, name):
        return self.columns[name]
