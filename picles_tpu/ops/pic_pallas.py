"""Pallas CIC accumulate kernel — the deposit as a halo *gather*.

The XLA pad-and-fold scatter (ops/pic.py) performs (2H+1)^2 statically
shifted adds, each a full HBM pass over the padded accumulator: measured
5.4 ms of the 8 ms step at 768^2 (H=3 -> 49 passes).  This kernel inverts
the dataflow: each *output* tile of the padded accumulator gathers the
contributions of all particles within its H-neighborhood from a single
VMEM-resident input window, so HBM sees ~2 passes total.  The boundary
fold (periodic wrap / non-periodic drop / tripolar seam / ppermute halo
exchange when sharded) is unchanged — this kernel only replaces
``scatter_accumulate_padded``.

Alignment: Mosaic requires the sublane (second-to-last) block dim to be a
multiple of 8, so the row window is ``bp + 2*PADR`` with ``bp % 8 == 0``
and ``PADR = ceil(H/4)*4 >= H``, and the padded-accumulator row count is
rounded up to a multiple of ``bp`` (extra rows read zero padding and are
sliced off).  Column windows span the full (padded) width, which is exempt
from the lane-alignment rule.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pic import ScatterStats


def _accum_kernel(xl: int, xh: int, yl: int, yh: int,
                  PADR: int, PADC: int, bp: int, bc: int,
                  xr_ref, yr_ref, c0_ref, c1_ref, c2_ref,
                  out0_ref, out1_ref, out2_ref):
    # Loop structure chosen for TPU vector-layout cost, not FLOPs: the
    # (2H+1)^2 window is irreducible for an exact CIC gather, but
    # lane-direction (column) rotations are far more expensive than
    # sublane (row) shifts.  So all column slicing is hoisted to one
    # rotate per dy of the dx-summed partial (O(2H+1) lane rotates total,
    # vs O((2H+1)^2) per-input rotates in the naive form); the inner
    # (dx, dy) iteration is pure row-shift + FMA in source-column
    # alignment.  CIC floor/weights are recomputed in VMEM from the two
    # position planes — 4 fewer HBM input streams than shipping
    # (fx, wxf, wxc, fy, wyf, wyc) precomputed.
    dtype = c0_ref.dtype
    px = jnp.clip(xr_ref[:], -float(xl), float(xh) - 1e-5)
    fxf = jnp.floor(px)
    fx = fxf.astype(jnp.int32)
    wxc = px - fxf
    wxf = 1.0 - wxc
    py = jnp.clip(yr_ref[:], -float(yl), float(yh) - 1e-5)
    fyf = jnp.floor(py)
    fy = fyf.astype(jnp.int32)
    wyc = py - fyf
    wyf = 1.0 - wyc
    c0, c1, c2 = c0_ref[:], c1_ref[:], c2_ref[:]

    # per-dx x-weight planes, rows pre-sliced to the output range,
    # full (source-aligned) columns
    WX = []
    for dx in range(-xl, xh + 1):
        rs = PADR - dx
        sub_fx = fx[rs:rs + bp, :]
        WX.append(jnp.where(sub_fx == dx, wxf[rs:rs + bp, :], 0.0)
                  + jnp.where(sub_fx == dx - 1, wxc[rs:rs + bp, :], 0.0))

    acc0 = jnp.zeros((bp, bc), c0_ref.dtype)
    acc1 = jnp.zeros((bp, bc), c0_ref.dtype)
    acc2 = jnp.zeros((bp, bc), c0_ref.dtype)
    for dy in range(-yl, yh + 1):
        wy = (jnp.where(fy == dy, wyf, 0.0)
              + jnp.where(fy == dy - 1, wyc, 0.0))
        q0, q1, q2 = wy * c0, wy * c1, wy * c2
        a0 = jnp.zeros_like(WX[0])
        a1 = jnp.zeros_like(WX[0])
        a2 = jnp.zeros_like(WX[0])
        for i, dx in enumerate(range(-xl, xh + 1)):
            rs = PADR - dx
            wx = WX[i]
            a0 = a0 + wx * q0[rs:rs + bp, :]
            a1 = a1 + wx * q1[rs:rs + bp, :]
            a2 = a2 + wx * q2[rs:rs + bp, :]
        cs = PADC - dy
        acc0 = acc0 + a0[:, cs:cs + bc]
        acc1 = acc1 + a1[:, cs:cs + bc]
        acc2 = acc2 + a2[:, cs:cs + bc]
    out0_ref[:] = acc0
    out1_ref[:] = acc1
    out2_ref[:] = acc2


def scatter_padded_channels_pallas(
        xrel: jnp.ndarray, yrel: jnp.ndarray, charge, active: jnp.ndarray,
        halo, *, block_x: int = 64, block_y: int = 0,
        interpret: bool = False) -> Tuple[Tuple[jnp.ndarray, ...], ScatterStats]:
    """Channel-plane core: returns 3 padded [nx+xl+xh, ny+yl+yh] planes.

    ``charge``: stacked [nx, ny, 3] or a 3-tuple of [nx, ny] planes.
    """
    # charge: stacked [nx, ny, 3] or a 3-tuple of [nx, ny] channel planes
    # (preferred — avoids the stacked minor-dim layout round-trip)
    chans = (charge if isinstance(charge, tuple)
             else tuple(charge[..., i] for i in range(3)))
    assert len(chans) == 3, "pallas accumulate kernel is specialized to 3 channels"
    nx, ny = chans[0].shape
    from .pic import normalize_halo

    (xl, xh), (yl, yh) = normalize_halo(halo)
    H_row = max(xl, xh)
    PADR = max(4, ((H_row + 3) // 4) * 4)  # >= max x-offset, 2*PADR % 8 == 0

    clamped = jnp.sum(((xrel < -float(xl)) | (xrel > float(xh) - 1e-5)
                       | (yrel < -float(yl)) | (yrel > float(yh) - 1e-5))
                      & active)
    act = active.astype(chans[0].dtype)
    ch0, ch1, ch2 = (c * act for c in chans)

    PADC = 64                  # >= max y-offset; 2*PADC % 128 == 0
    npx, nyp = nx + xl + xh, ny + yl + yh
    bp = min(block_x, 8 * ((npx + 7) // 8))
    bp = max(8, (bp // 8) * 8)
    npx_pad = ((npx + bp - 1) // bp) * bp
    if block_y <= 0:
        # widest column block that fits VMEM: every input window pays a
        # fixed 2*PADC=128-lane surcharge, so fewer/wider column blocks
        # read fewer total lanes (full-width = one j-block = surcharge paid
        # once; measured 0.21 vs 0.32 ms at 1536^2 vs the old fixed 256).
        full = 128 * ((nyp + 127) // 128)
        budget = 15 * 1024 * 1024

        def vmem(bc):
            # 5 input windows + 3 output blocks, double-buffered; the x1.9
            # covers the kernel's window-sized temporaries (weights, WX
            # planes, per-dy partials) in Mosaic's scoped stack — measured
            # 26.58 MB actual vs 14.5 MB I/O-only estimate at 3072^2.
            io = (5 * (bp + 2 * PADR) * (bc + 2 * PADC)
                  + 3 * bp * bc) * 4 * 2
            return (io * 19) // 10

        bc = full
        while bc > 256 and vmem(bc) > budget:
            bc -= 128
        block_y = bc
    bc = min(block_y, 128 * ((nyp + 127) // 128))
    nyp_pad = ((nyp + bc - 1) // bc) * bc

    # particle i lives at padded row i + PADR + xl, col j + PADC + yl
    row_pad = (PADR + xl, npx_pad + PADR - xl - nx)
    col_pad = (PADC + yl, nyp_pad + PADC - yl - ny)
    pad = (row_pad, col_pad)
    ins = [jnp.pad(xrel, pad), jnp.pad(yrel, pad),
           jnp.pad(ch0, pad), jnp.pad(ch1, pad), jnp.pad(ch2, pad)]

    grid = (npx_pad // bp, nyp_pad // bc)
    win_rows = bp + 2 * PADR
    win_cols = bc + 2 * PADC
    in_specs = [pl.BlockSpec((pl.Element(win_rows), pl.Element(win_cols)),
                             lambda i, j: (i * bp, j * bc),
                             memory_space=pltpu.VMEM) for _ in ins]
    out_spec = pl.BlockSpec((bp, bc), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((npx_pad, nyp_pad), chans[0].dtype)
    kernel = functools.partial(_accum_kernel, xl, xh, yl, yh,
                               PADR, PADC, bp, bc)
    o0, o1, o2 = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(f32, f32, f32),
        interpret=interpret,
    )(*ins)
    return ((o0[:npx, :nyp], o1[:npx, :nyp], o2[:npx, :nyp]),
            ScatterStats(clamped=clamped))


def scatter_accumulate_padded_pallas(
        xrel: jnp.ndarray, yrel: jnp.ndarray, charge, active: jnp.ndarray,
        halo, *, block_x: int = 64,
        interpret: bool = False) -> Tuple[jnp.ndarray, ScatterStats]:
    """Drop-in replacement for pic.scatter_accumulate_padded (3 channels):
    the channel-plane core stacked into [nx+xl+xh, ny+yl+yh, 3]."""
    planes, st = scatter_padded_channels_pallas(
        xrel, yrel, charge, active, halo, block_x=block_x,
        interpret=interpret)
    return jnp.stack(planes, axis=-1), st
