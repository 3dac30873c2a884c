"""Shared Pallas tiling helpers.

TPU vector tiles are (8, 128) for f32: an x-block size that is not a
multiple of 8 (e.g. the largest divisor of a prime nx) degenerates into
sublane-misaligned 1-row blocks — a silent performance cliff or a Mosaic
lowering failure.  Instead of searching divisors, every row-tiled kernel
pads the row axis up to a multiple of the chosen block and slices the
outputs back (VERDICT r2 item 5).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def row_block(nx: int, block_x: int) -> Tuple[int, int]:
    """Pick an 8-aligned x-block <= block_x and the padded row count.

    Returns ``(bx, nx_pad)`` with ``bx % 8 == 0`` (unless nx itself is
    tiny) and ``nx_pad % bx == 0``.
    """
    bx = max(8, (min(block_x, nx + 7) // 8) * 8)
    nx_pad = ((nx + bx - 1) // bx) * bx
    return bx, nx_pad


def auto_block_x(ny: int, n_buffers: int, *, dtype_bytes: int = 4,
                 vmem_budget: int = 14 * 1024 * 1024) -> int:
    """Size an x-block from a VMEM budget against the 16 MB scoped limit.

    Mosaic lays each [bx, ny] VMEM buffer out in (8, 128) tiles, so the
    lane axis occupies ``ceil(ny/128)*128`` lanes regardless of ny.
    ``n_buffers`` is the *measured* stack footprint in f32-buffer units
    (Mosaic's scoped allocation counts in/out double-buffering plus every
    live temporary through the while body), not the hand-counted live
    lanes: the advance kernel's compile-time request at [256, 180] was
    24.28 MB = 92.6 buffers (vs 45 naively counted).  Sizing with the
    naive count over-blocks ~2x and trips the scoped-vmem limit at
    awkward ny (observed at the 360x180 tripolar grid).
    """
    ny_lanes = ((ny + 127) // 128) * 128
    per_row = ny_lanes * n_buffers * dtype_bytes
    bx = max(8, vmem_budget // per_row)
    # The sublane minimum is 8 rows; if even that overruns the 16 MB
    # scoped-VMEM hard limit (very wide ny), fail with an actionable
    # message instead of an opaque Mosaic AOT OOM.
    hard_limit = 16 * 1024 * 1024
    if bx * per_row > hard_limit:
        raise ValueError(  # callers with a fallback: see fits_row_tiling
            f"grid too wide for row-tiled Pallas kernels: ny={ny} needs "
            f"{bx * per_row / 2**20:.1f} MB of scoped VMEM at the minimum "
            f"8-row block ({n_buffers} buffers x {ny_lanes} lanes), above "
            f"the {hard_limit / 2**20:.0f} MB limit. Use the XLA backends "
            f"(advance_mode='xla', scatter_mode='dense') or shard the y "
            f"axis over the device mesh (picles_tpu.parallel).")
    return bx


def fits_row_tiling(ny: int, n_buffers: int, *, dtype_bytes: int = 4) -> bool:
    """True when an 8-row full-width block of ``n_buffers`` f32 streams
    fits the 16 MB scoped-VMEM limit — the predicate behind
    ``auto_block_x``'s error, for callers that have a graceful fallback
    (e.g. the model's auto-dt path drops to the XLA estimate on
    ultra-wide grids instead of raising from the default config)."""
    ny_lanes = ((ny + 127) // 128) * 128
    return 8 * ny_lanes * n_buffers * dtype_bytes <= 16 * 1024 * 1024


def col_block(ny: int, n_buffers: int, *, dtype_bytes: int = 4,
              vmem_budget: int = 14 * 1024 * 1024,
              target_bx: int = 24) -> int:
    """Column-block width for very wide grids.

    Full-width row tiling is the measured-fastest layout wherever it fits
    (2D [24, 1536] tiles at 3072^2 were ~3% SLOWER than the 8-row
    full-width blocks — the sublane penalty is smaller than the 2D grid
    iteration cost).  Column tiling therefore engages ONLY where even the
    minimum 8-row full-width block would blow the 16 MB scoped-VMEM hard
    limit (ny >= ~5300 at 93 buffers) — the case that previously raised a
    ValueError.  Returns ny's full lane width when 1D tiling fits (caller
    keeps it), else a 128-aligned width giving ``target_bx`` rows."""
    ny_lanes = ((ny + 127) // 128) * 128
    per_lane = n_buffers * dtype_bytes
    hard_limit = 16 * 1024 * 1024
    if 8 * ny_lanes * per_lane <= hard_limit:
        return ny_lanes
    bc = (vmem_budget // (target_bx * per_lane) // 128) * 128
    return max(128, bc)


def pad_rows(arr: jnp.ndarray, nx_pad: int, fill=None) -> jnp.ndarray:
    """Pad the leading axis to ``nx_pad`` rows.

    ``fill=None`` replicates the last row (safe for coordinates and state
    planes — keeps the RHS/wind math finite on padding); a scalar fill is
    for masks (pad with 0 so padded lanes stay inactive).
    """
    pad = nx_pad - arr.shape[0]
    if pad <= 0:
        return arr
    widths = ((0, pad),) + ((0, 0),) * (arr.ndim - 1)
    if fill is None:
        return jnp.pad(arr, widths, mode="edge")
    return jnp.pad(arr, widths, constant_values=fill)


def pad_cols(arr: jnp.ndarray, ny_pad: int, fill=None) -> jnp.ndarray:
    """Pad the second axis to ``ny_pad`` columns (see ``pad_rows``)."""
    pad = ny_pad - arr.shape[1]
    if pad <= 0:
        return arr
    widths = ((0, 0), (0, pad)) + ((0, 0),) * (arr.ndim - 2)
    if fill is None:
        return jnp.pad(arr, widths, mode="edge")
    return jnp.pad(arr, widths, constant_values=fill)
