"""Shared NetCDF variable reader.

One strategy for every loader in the package (MOM6 supergrids,
gridded-wind forcing files): NetCDF-4/HDF5 via h5py, falling back to
scipy's NetCDF-3 reader — the analog of the reference's NCDatasets usage
(TripolarGridMOM6.jl, T03_PIC_tripolar_realistic.jl:54).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def read_netcdf_vars(path: str, names: Sequence[str]) -> Dict[str, np.ndarray]:
    """Read the named variables from a NetCDF-4 (h5py) or NetCDF-3
    (scipy fallback) file as numpy arrays."""
    try:
        import h5py
        with h5py.File(path, "r") as f:
            return {n: np.asarray(f[n]) for n in names}
    except (OSError, KeyError):
        from scipy.io import netcdf_file
        with netcdf_file(path, "r", mmap=False) as f:
            return {n: np.asarray(f.variables[n].data) for n in names}
