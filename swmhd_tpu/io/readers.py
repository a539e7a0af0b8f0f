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
        return np.load(os.path.join(self._dir, f"{i:06d}.npy"))

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
