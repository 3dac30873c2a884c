"""Mask utilities (reference src/Grids/mask_utils.jl).

Dense int masks instead of index lists: downstream kernels are fully
vectorized, so "boundary lists" (mask_utils.jl:71-82) are just boolean masks.
"""

from __future__ import annotations

import numpy as np

from .base import Boundary


def interior_boundary(mask: np.ndarray) -> np.ndarray:
    """Land nodes adjacent (4-neighborhood, circshift semantics) to ocean
    (reference mask_utils.jl:14-22).  mask: bool, True = ocean."""
    mask = np.asarray(mask, dtype=bool)
    b = np.zeros_like(mask)
    for shift in [(1, 0), (-1, 0), (0, 1), (0, -1)]:
        b |= np.roll(mask, shift, axis=(0, 1)) & ~mask
    return b


def make_boundaries(mask: np.ndarray, bx: Boundary, by: Boundary) -> np.ndarray:
    """Total mask {0 land, 1 ocean, 2 land-boundary, 3 grid-boundary}
    (reference mask_utils.jl:38-55).  Non-periodic edges are forced to 3."""
    mask = np.asarray(mask, dtype=bool)
    total = mask.astype(np.int32) + 2 * interior_boundary(mask).astype(np.int32)
    if bx == Boundary.NONPERIODIC:
        total[0, :] = 3
        total[-1, :] = 3
    if by == Boundary.NONPERIODIC:
        total[:, 0] = 3
        total[:, -1] = 3
    return total


def mask_circle(mask: np.ndarray, xx: np.ndarray, yy: np.ndarray,
                pp_ij, radius: float) -> np.ndarray:
    """Punch a circular land hole into an ocean mask
    (reference mask_utils.jl:106-139).  Returns a new bool mask."""
    mask = np.asarray(mask, dtype=bool).copy()
    px, py = xx[pp_ij[0], pp_ij[1]], yy[pp_ij[0], pp_ij[1]]
    inside = (xx - px) ** 2 + (yy - py) ** 2 < radius ** 2
    mask[inside] = False
    return mask
