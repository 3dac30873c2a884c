"""Spherical (lon/lat) 2D grid (reference src/Grids/SphericalGrid.jl).

Metric spacings in meters come from centered differences of the coordinate
arrays with cos-latitude scaling (SphericalGrid.jl:25-75, R = 6371 km).

Deviation from the reference, documented: the reference's per-node projection
kernel (SphericalGrid.jl:207-238) computes ``cos_lat = cos(dy * pi/180)``
where ``dy`` is the metric spacing *in meters* — cos of an O(1e5) number —
which is a transcription bug (the metric dx already carries the cos-latitude
factor via cal_dx_meters).  Here the projection is the physically correct
``M = diag(1/dx_m, 1/dy_m)`` (m/s -> grid-index/s); propagation speed over
the sphere is pinned by the great-circle tests instead.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .base import Boundary, Grid2D, GridStats
from .mask import make_boundaries

EARTH_RADIUS = 6371.0e3   # meters (reference SphericalGrid.jl:56)
PC_EARTH_RADIUS = 6.3710e6  # radius used by the great-circle correction


def cal_dx_degree(XX: np.ndarray) -> np.ndarray:
    """Centered-difference lon spacing in degrees (SphericalGrid.jl:25-31)."""
    dx = np.zeros_like(XX)
    dx[1:-1, :] = (XX[2:, :] - XX[:-2, :]) / 2
    dx[0, :] = XX[1, :] - XX[0, :]
    dx[-1, :] = XX[-1, :] - XX[-2, :]
    return dx


def cal_dy_degree(YY: np.ndarray) -> np.ndarray:
    """Centered-difference lat spacing in degrees (SphericalGrid.jl:33-39)."""
    dy = np.zeros_like(YY)
    dy[:, 1:-1] = (YY[:, 2:] - YY[:, :-2]) / 2
    dy[:, 0] = YY[:, 1] - YY[:, 0]
    dy[:, -1] = YY[:, -1] - YY[:, -2]
    return dy


def cal_dx_meters(XX: np.ndarray, YY: np.ndarray) -> np.ndarray:
    """Lon spacing in meters with cos-lat scaling (SphericalGrid.jl:54-59)."""
    r_meridian = EARTH_RADIUS * np.cos(YY * math.pi / 180.0)
    return cal_dx_degree(XX) * math.pi / 180.0 * r_meridian


def cal_dy_meters(YY: np.ndarray) -> np.ndarray:
    """Lat spacing in meters (SphericalGrid.jl:72-75)."""
    return cal_dy_degree(YY) * math.pi / 180.0 * EARTH_RADIUS


def propagation_correction_coef(lat_deg: np.ndarray,
                                R: float = PC_EARTH_RADIUS) -> np.ndarray:
    """Great-circle steering coefficient sign(lat)*min(|tand(lat)|, 60)/R
    (reference spherical_grid_corrections.jl:3-21).  Multiplied by cg_x in
    the RHS to rotate the group-velocity vector."""
    t = np.tan(lat_deg * math.pi / 180.0)
    return np.sign(lat_deg) * np.minimum(np.sign(lat_deg) * t, 60.0) / R


def spherical_grid_2d(xmin: float, xmax: float, nx: int,
                      ymin: float, ymax: float, ny: int, *,
                      mask: Optional[np.ndarray] = None,
                      total_mask: Optional[np.ndarray] = None,
                      angle: float = 0.0,
                      periodic_boundary: Tuple[bool, bool] = (False, False),
                      dtype=jnp.float32) -> Grid2D:
    """Build a TwoDSphericalGridMesh analog (reference SphericalGrid.jl:200-204).

    Coordinates in degrees (lon = x, lat = y).
    """
    dx_deg = (xmax - xmin) / (nx - 1)
    dy_deg = (ymax - ymin) / (ny - 1)
    bx = Boundary.PERIODIC if periodic_boundary[0] else Boundary.NONPERIODIC
    by = Boundary.PERIODIC if periodic_boundary[1] else Boundary.NONPERIODIC

    x = np.linspace(xmin, xmax, nx)
    y = np.linspace(ymin, ymax, ny)
    XX, YY = np.meshgrid(x, y, indexing="ij")

    dxm = cal_dx_meters(XX, YY)
    dym = cal_dy_meters(YY)
    area = dxm * dym

    if total_mask is None:
        if mask is None:
            mask = np.ones((nx, ny), dtype=bool)
        total_mask = make_boundaries(mask, bx, by)
    total_mask = np.asarray(total_mask, dtype=np.int32)

    proj = np.zeros((nx, ny, 2, 2))
    proj[..., 0, 0] = 1.0 / dxm
    proj[..., 1, 1] = 1.0 / dym

    stats = GridStats(nx=nx, ny=ny, bx=bx, by=by, xmin=xmin, xmax=xmax,
                      ymin=ymin, ymax=ymax, dx=dx_deg, dy=dy_deg, angle=angle,
                      kind="spherical")
    return Grid2D(
        x=jnp.asarray(XX, dtype), y=jnp.asarray(YY, dtype),
        dx_m=jnp.asarray(dxm, dtype), dy_m=jnp.asarray(dym, dtype),
        area=jnp.asarray(area, dtype),
        angle=jnp.zeros((nx, ny), dtype),
        mask=jnp.asarray(total_mask),
        proj=jnp.asarray(proj, dtype),
        pc=jnp.asarray(propagation_correction_coef(YY), dtype),
        stats=stats)
