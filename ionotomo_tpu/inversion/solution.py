"""Solution state container (reference: `Solution`, SURVEY.md §2).

Holds the reconstruction per timestep plus convergence diagnostics, with
HDF5 persistence so results interoperate with DataPack tooling, and npz
checkpoint integration (utils.checkpoint) as the resume unit.
"""
from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from ..core.grids import Grid3D


class Solution:
    """Reconstructed log-density fields m[Nt, nx, ny, nz] on a Grid3D."""

    def __init__(self, grid: Grid3D, m, diagnostics=None, config_json=""):
        self.grid = grid
        self.m = np.asarray(m)
        if self.m.ndim == 3:
            self.m = self.m[None]
        self.diagnostics = dict(diagnostics or {})
        self.config_json = config_json

    @property
    def num_times(self):
        return self.m.shape[0]

    def ne(self, t=0):
        """Electron density field [m^-3] at timestep t."""
        from .. import constants
        return constants.K_NE * np.exp(self.m[t])

    def save(self, path):
        if h5py is None:
            raise RuntimeError("h5py unavailable")
        with h5py.File(path, "w") as f:
            f.attrs["config"] = self.config_json
            f.create_dataset("grid/origin", data=np.asarray(self.grid.origin))
            f.create_dataset("grid/spacing",
                             data=np.asarray(self.grid.spacing))
            f.create_dataset("grid/shape",
                             data=np.asarray(self.grid.shape, np.int64))
            f.create_dataset("m", data=self.m)
            for k, v in self.diagnostics.items():
                f.create_dataset(f"diagnostics/{k}", data=np.asarray(v))

    @staticmethod
    def load(path):
        if h5py is None:
            raise RuntimeError("h5py unavailable")
        with h5py.File(path, "r") as f:
            grid = Grid3D.create(f["grid/origin"][:], f["grid/spacing"][:],
                                 tuple(f["grid/shape"][:]))
            diags = {}
            if "diagnostics" in f:
                for k in f["diagnostics"]:
                    diags[k] = f[f"diagnostics/{k}"][:]
            return Solution(grid, f["m"][:], diags,
                            str(f.attrs.get("config", "")))
