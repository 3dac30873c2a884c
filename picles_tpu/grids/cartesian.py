"""Cartesian 2D grid (reference src/Grids/CartesianGrid.jl).

The projection kernel (CartesianGrid.jl:115-136) converting m/s into
grid-index/s is materialized as a per-node [2,2] array (constant over the
grid, broadcast at build time so the RHS needs no grid-type dispatch).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .base import Boundary, Grid2D, GridStats
from .mask import make_boundaries


def projection_kernel_cartesian(dx: float, dy: float, angle_deg: float) -> np.ndarray:
    """Projection m/s -> grid-index/s for a grid whose i-axis is rotated
    ``angle`` degrees from physical x (reference CartesianGrid.jl:115-131).

    The grid axes are e_i = (cos a, sin a), e_j = (-sin a, cos a), so the
    index rates of a physical velocity v are di/dt = (v . e_i)/dx and
    dj/dt = (v . e_j)/dy:  M = [[c/dx, s/dx], [-s/dy, c/dy]].

    DOCUMENTED REFERENCE BUG FIX (same policy as the spherical
    ``cos(dy_m deg)`` fix, grids/spherical.py): the reference's rotated
    branch builds the symmetric matrix ``[cosa/dx sina/dy; sina/dx
    cosa/dy]`` (CartesianGrid.jl:125-128) — both off-diagonals +sin and
    row-crossed spacings.  That matrix is not a rotation composed with a
    scaling (det = cos(2a)/(dx dy), SINGULAR at 45 deg: every velocity
    collapses onto the grid diagonal), so physically x-directed swell on
    a rotated grid would advect with the wrong sign along j.  The
    ``angle == 0`` branch — the only configuration the reference's tests
    exercise — is identical in both forms."""
    if angle_deg == 0.0:
        return np.array([[1.0 / dx, 0.0], [0.0, 1.0 / dy]])
    c = math.cos(angle_deg * math.pi / 180.0)
    s = math.sin(angle_deg * math.pi / 180.0)
    return np.array([[c / dx, s / dx], [-s / dy, c / dy]])


def cartesian_grid_2d(xmin: float, xmax: float, nx: int,
                      ymin: float, ymax: float, ny: int, *,
                      mask: Optional[np.ndarray] = None,
                      total_mask: Optional[np.ndarray] = None,
                      angle: float = 0.0,
                      periodic_boundary: Tuple[bool, bool] = (False, False),
                      dtype=jnp.float32) -> Grid2D:
    """Build a TwoDCartesianGridMesh analog (reference CartesianGrid.jl:104-112).

    ``nx`` points span [xmin, xmax] inclusive; dx = (xmax-xmin)/(nx-1).
    """
    dx = (xmax - xmin) / (nx - 1)
    dy = (ymax - ymin) / (ny - 1)
    bx = Boundary.PERIODIC if periodic_boundary[0] else Boundary.NONPERIODIC
    by = Boundary.PERIODIC if periodic_boundary[1] else Boundary.NONPERIODIC

    x = np.linspace(xmin, xmax, nx)
    y = np.linspace(ymin, ymax, ny)
    XX, YY = np.meshgrid(x, y, indexing="ij")

    if total_mask is None:
        if mask is None:
            mask = np.ones((nx, ny), dtype=bool)
        total_mask = make_boundaries(mask, bx, by)
    total_mask = np.asarray(total_mask, dtype=np.int32)

    M = projection_kernel_cartesian(dx, dy, angle)
    proj = np.broadcast_to(M, (nx, ny, 2, 2))

    stats = GridStats(nx=nx, ny=ny, bx=bx, by=by, xmin=xmin, xmax=xmax,
                      ymin=ymin, ymax=ymax, dx=dx, dy=dy, angle=angle,
                      kind="cartesian")
    return Grid2D(
        x=jnp.asarray(XX, dtype), y=jnp.asarray(YY, dtype),
        dx_m=jnp.full((nx, ny), dx, dtype), dy_m=jnp.full((nx, ny), dy, dtype),
        area=jnp.full((nx, ny), dx * dy, dtype),
        angle=jnp.full((nx, ny), angle * math.pi / 180.0, dtype),
        mask=jnp.asarray(total_mask),
        proj=jnp.asarray(proj, dtype),
        pc=jnp.zeros((nx, ny), dtype),
        stats=stats)


def cartesian_box(dimx: float, nx: int, dimy: float, ny: int, *,
                  angle: float = 0.0,
                  periodic_boundary: Tuple[bool, bool] = (False, False),
                  dtype=jnp.float32) -> Grid2D:
    """Shorthand box constructor (reference CartesianGrid.jl:111-112):
    ``TwoDCartesianGridMesh(100e3, 51, 100e3, 51)`` style."""
    return cartesian_grid_2d(0.0, dimx, nx, 0.0, dimy, ny, angle=angle,
                             periodic_boundary=periodic_boundary, dtype=dtype)
