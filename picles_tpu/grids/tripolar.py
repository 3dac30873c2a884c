"""Tripolar (MOM6) grid (reference src/Grids/TripolarGridMOM6.jl).

Two entry points:

``mom6_grid_from_supergrid(x, y, dx, dy, area, angle_dx, k, ...)`` — the
C-grid extraction + distance aggregation pipeline of the reference
(extract_grid_points :42-103, calculate_distances :203-264), operating on
in-memory supergrid arrays.  ``load_mom6_grid(path, k)`` reads those arrays
from a NetCDF supergrid file (h5py for NetCDF-4, scipy for NetCDF-3); the
reference's own data files are absent from the snapshot
(.MISSING_LARGE_BLOBS), so tests run on a synthetic fixture.

``synthetic_tripolar_supergrid(nx, ny)`` — an analytic stand-in: regular
lon/lat below a join latitude and a progressively rotated/converging
northern cap with the tripolar north-seam mirror symmetry
(dyr[:, end] = dyr[end:-1:1, end-3], reference :246-247), sized so every
code path (stride extraction, seam periodicity, pole masking, rotation
projection kernels) is exercised.

Projection kernel (reference :436-459): per-node rotation
``M = [[cos a/dx, sin a/dy], [-sin a/dx, cos a/dy]]`` with ``a`` the local
grid angle clockwise from true north.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .base import Boundary, Grid2D, GridStats
from .mask import make_boundaries, mask_circle
from .spherical import propagation_correction_coef


# ---------------------------------------------------------------------------
# supergrid -> C-grid pipeline
# ---------------------------------------------------------------------------

def extract_grid_points(x, y, angle_dx, k: int, mask=None):
    """C-grid point extraction with stride k (reference :42-103); returns a
    dict with T/U/V/Q point locations and the T-point angle."""
    x = np.asarray(x)
    y = np.asarray(y)
    angle_dx = np.asarray(angle_dx)
    if x.shape != y.shape:
        raise ValueError("x and y have different shapes")
    khalf = k // 2
    ci = slice(khalf, x.shape[0], k)   # 0-based form of khalf+1:k:end
    cj = slice(khalf, x.shape[1], k)
    qi = slice(0, x.shape[0], k)
    qj = slice(0, x.shape[1], k)

    out = dict(
        t_lon=x[ci, cj], t_lat=y[ci, cj],
        u_lon=x[qi, cj], u_lat=y[qi, cj],
        v_lon=x[ci, qj], v_lat=y[ci, qj],
        q_lon=x[qi, qj], q_lat=y[qi, qj],
        angle=angle_dx[ci, cj], k=k, khalf=khalf)
    if mask is not None:
        mask = np.asarray(mask)
        if k == 2:
            out["mask"] = mask == 1
        elif k in (4, 6, 8):
            out["mask"] = mask[::k // 2, ::k // 2] == 1
        else:
            raise ValueError("k must be 2, 4, 6 or 8")
    else:
        out["mask"] = None
    return out


def calculate_distances(area, dx, dy, k: int, khalf: int):
    """Aggregate supergrid cell metrics to stride-k T cells
    (reference :203-264), including the north-seam mirror rows."""
    area = np.asarray(area, dtype=np.float64)
    dx = np.asarray(dx, dtype=np.float64)
    dy = np.asarray(dy, dtype=np.float64)

    tarea = sum(area[i::k, j::k] for i in range(k) for j in range(k))
    dxt = sum(dx[j::k, khalf::k] for j in range(k))
    dyt = sum(dy[khalf::k, i::k] for i in range(k))
    dxCv = sum(dx[j::k, k::k] for j in range(k))
    dyCu = sum(dy[k::k, i::k] for i in range(k))

    dxr = np.roll(dx, -khalf, axis=0)
    dxCu = sum(dxr[j::k, khalf::k] for j in range(k))

    dyr = np.roll(dy, -khalf, axis=1)
    # north seam periodicity (reference :246-247)
    dyr[:, -1] = dyr[::-1, -4]
    dyr[:, -2] = dyr[::-1, -3]
    dyCv = sum(dyr[khalf::k, i::k] for i in range(k))

    return dict(tarea=tarea, dxt=dxt, dyt=dyt, dxCv=dxCv, dyCu=dyCu,
                dxCu=dxCu, dyCv=dyCv)


def tripolar_mask_pols(mask: np.ndarray, lons, lats, dyCv,
                       radius_deg: float) -> np.ndarray:
    """Mask the three tripolar poles (two seam poles + center) and a south
    band (reference TripolarGrid_mask_pols!, :469-486)."""
    mask = np.asarray(mask, dtype=bool).copy()
    nx, ny = mask.shape
    for pp in [(0, ny - 1), (nx - 1, ny - 1), (round(nx / 2) - 1, ny - 1)]:
        mask = mask_circle(mask, np.asarray(lons), np.asarray(lats), pp,
                           radius_deg)
    dx_deg = float(np.mean(dyCv)) / 110e3
    ny_mask = int(math.ceil(radius_deg / dx_deg))
    mask[:, :ny_mask] = False
    return mask


def mom6_grid_from_supergrid(x, y, dx, dy, area, angle_dx, k: int = 2, *,
                             mask=None, total_mask=None, mask_radius=3,
                             dtype=jnp.float32) -> Grid2D:
    """Build the tripolar Grid2D from supergrid arrays (reference
    MOM6GridMesh constructors, :332-432)."""
    G = extract_grid_points(x, y, angle_dx, k, mask=mask)
    GA = calculate_distances(area, dx, dy, G["k"], G["khalf"])

    t_lon, t_lat = G["t_lon"], G["t_lat"]
    nx, ny = t_lon.shape
    dxm, dym = GA["dxCu"], GA["dyCv"]

    m = G["mask"]
    if m is None:
        m = np.ones((nx, ny), dtype=bool)
        m = tripolar_mask_pols(m, t_lon, t_lat, dym, mask_radius)
    if total_mask is None:
        total_mask = make_boundaries(m, Boundary.PERIODIC,
                                     Boundary.TRIPOLAR_NORTH)

    ang = np.asarray(G["angle"], dtype=np.float64)
    ca, sa = np.cos(np.radians(ang)), np.sin(np.radians(ang))
    proj = np.zeros((nx, ny, 2, 2))
    proj[..., 0, 0] = ca / dxm
    proj[..., 0, 1] = sa / dym
    proj[..., 1, 0] = -sa / dxm
    proj[..., 1, 1] = ca / dym

    stats = GridStats(nx=nx, ny=ny, bx=Boundary.PERIODIC,
                      by=Boundary.TRIPOLAR_NORTH,
                      xmin=float(t_lon.min()), xmax=float(t_lon.max()),
                      ymin=float(t_lat.min()), ymax=float(t_lat.max()),
                      dx=float(np.mean(dxm)), dy=float(np.mean(dym)),
                      kind="tripolar")
    return Grid2D(
        x=jnp.asarray(t_lon, dtype), y=jnp.asarray(t_lat, dtype),
        dx_m=jnp.asarray(dxm, dtype), dy_m=jnp.asarray(dym, dtype),
        area=jnp.asarray(GA["tarea"], dtype),
        angle=jnp.asarray(np.radians(ang), dtype),
        mask=jnp.asarray(np.asarray(total_mask, np.int32)),
        proj=jnp.asarray(proj, dtype),
        pc=jnp.asarray(propagation_correction_coef(np.asarray(t_lat)), dtype),
        stats=stats)


# ---------------------------------------------------------------------------
# NetCDF loader
# ---------------------------------------------------------------------------

def load_mom6_grid(grid_file: str, k: int = 2, *, mask_file: Optional[str] = None,
                   mask_radius: float = 5.0, dtype=jnp.float32) -> Grid2D:
    """Read a MOM6 supergrid NetCDF (ocean_hgrid style: variables x, y, dx,
    dy, area, angle_dx) and build the grid (reference :398-430).

    Reads NetCDF-4 via h5py, falling back to scipy's NetCDF-3 reader.
    """
    from ..utils.io import read_netcdf_vars as _read

    v = _read(grid_file, ["x", "y", "dx", "dy", "area", "angle_dx"])
    # NetCDF stores [ny, nx]; the reference indexes [x, y] — transpose.
    arrs = {n: a.T if a.ndim == 2 else a for n, a in v.items()}
    mask = None
    if mask_file is not None:
        mask = _read(mask_file, ["mask"])["mask"].T
    return mom6_grid_from_supergrid(arrs["x"], arrs["y"], arrs["dx"],
                                    arrs["dy"], arrs["area"],
                                    arrs["angle_dx"], k, mask=mask,
                                    mask_radius=mask_radius, dtype=dtype)


# ---------------------------------------------------------------------------
# synthetic fixture
# ---------------------------------------------------------------------------

def synthetic_tripolar_supergrid(nx_super: int = 64, ny_super: int = 48, *,
                                 lat_min: float = -75.0,
                                 lat_join: float = 55.0,
                                 lat_max: float = 89.0):
    """Analytic supergrid with tripolar-like geometry for tests.

    Regular lon/lat below ``lat_join``; above it the grid rows progressively
    rotate (nonzero angle_dx) and converge in dx like a polar cap, with the
    seam-mirror property dy[i, top] == dy[nx-1-i, top] enforced.  Returns
    (x, y, dx, dy, area, angle_dx) shaped [nx_super+1, ny_super+1] for the
    point arrays and [nx_super, ny_super(+1)] staggered metric arrays the
    way MOM6 supergrids do: here, for simplicity, all arrays share the
    [nx_super, ny_super] cell-metric shape and [nx_super, ny_super] point
    shape — sufficient for the extraction pipeline, which only strides.
    """
    R = 6371.0e3
    xs = np.linspace(0.0, 360.0, nx_super, endpoint=False)
    ys = np.linspace(lat_min, lat_max, ny_super)
    X, Y = np.meshgrid(xs, ys, indexing="ij")

    # angle: zero below the join, growing rotation toward the seam,
    # antisymmetric in x about the center (tripolar fold symmetry)
    frac = np.clip((Y - lat_join) / (lat_max - lat_join), 0.0, 1.0)
    ang = 30.0 * frac * np.sin(np.radians(X))

    dlon = 360.0 / nx_super
    dlat = (lat_max - lat_min) / (ny_super - 1)
    dx = R * np.cos(np.radians(np.clip(Y, -89.9, 89.9))) * np.radians(dlon)
    dx = np.maximum(dx, 1e3)
    dy = R * np.radians(dlat) * np.ones_like(Y)
    # northern-cap convergence + seam mirror consistency
    dy *= (1.0 - 0.3 * frac)
    dy[:, -1] = dy[::-1, -4]
    dy[:, -2] = dy[::-1, -3]
    area = dx * dy
    return X, Y, dx, dy, area, ang


def synthetic_tripolar_grid(k: int = 2, **kw) -> Grid2D:
    """Convenience: synthetic supergrid -> Grid2D."""
    X, Y, dx, dy, area, ang = synthetic_tripolar_supergrid(**kw)
    return mom6_grid_from_supergrid(X, Y, dx, dy, area, ang, k)
