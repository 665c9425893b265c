"""Minimal NetCDF reader (no netCDF4 dependency).

rrtmgp-data v1.9 ships NetCDF4 (= HDF5) files; this reads them via h5py.
Classic NetCDF3 falls back to scipy. Mirrors only what the reference loaders
need (ref /root/reference/ext/lookup_constructors.jl): named dimensions,
variables as numpy arrays, and char-matrix → string lists.
"""

from __future__ import annotations

import numpy as np


class Dataset:
    """Read-only mapping view of a NetCDF file: ``ds.dims``, ``ds[varname]``."""

    def __init__(self, path: str):
        self.path = path
        self._vars: dict[str, np.ndarray] = {}
        self.dims: dict[str, int] = {}
        #: per-variable dimension NAMES in on-disk (C/row-major) axis order;
        #: () when the file carries no dimension metadata for a variable.
        #: The loaders permute by these names (robust to any on-disk order),
        #: falling back to size matching only when names are absent.
        self.var_dims: dict[str, tuple[str, ...]] = {}
        try:
            self._load_hdf5(path)
        except OSError:
            self._load_netcdf3(path)

    def _load_hdf5(self, path: str) -> None:
        import h5py

        with h5py.File(path, "r") as f:
            phony = {}

            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    self._vars[name] = obj[()]
                    # NetCDF4 stores dimension scales; collect named dims
                    dim_names = []
                    for i, dim in enumerate(obj.dims):
                        names_i = [scale.name.lstrip("/") for scale in dim.values()]
                        for n in names_i:
                            phony[n] = obj.shape[i]
                        dim_names.append(names_i[0] if names_i else "")
                    if any(dim_names):
                        self.var_dims[name] = tuple(dim_names)

            f.visititems(visit)
            # netCDF4 dimensions appear as datasets with CLASS=DIMENSION_SCALE
            for name, arr in list(self._vars.items()):
                self.dims.setdefault(name, arr.shape[0] if arr.ndim else 1)
            self.dims.update(phony)

    def _load_netcdf3(self, path: str) -> None:
        from scipy.io import netcdf_file

        with netcdf_file(path, "r", mmap=False) as f:
            self.dims = {k: (v if v is not None else 0) for k, v in f.dimensions.items()}
            for name, var in f.variables.items():
                self._vars[name] = np.array(var[()])
                self.var_dims[name] = tuple(var.dimensions)

    def __getitem__(self, name: str) -> np.ndarray:
        return self._vars[name]

    def __contains__(self, name: str) -> bool:
        return name in self._vars

    def keys(self):
        return self._vars.keys()


def char_to_strings(arr: np.ndarray) -> list[str]:
    """Decode a NetCDF (n, strlen) char matrix into stripped python strings."""
    if arr.dtype.kind in ("S", "U") and arr.ndim == 2:
        return ["".join(c.decode() if isinstance(c, bytes) else c for c in row).strip() for row in arr]
    if arr.dtype.kind in ("S", "U") and arr.ndim == 1:
        return [(s.decode() if isinstance(s, bytes) else s).strip() for s in arr]
    raise ValueError(f"cannot decode strings from array of dtype {arr.dtype}, ndim {arr.ndim}")
