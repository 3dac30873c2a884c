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


def _gather_accumulate(xl: int, xh: int, yl: int, yh: int,
                       PADR: int, PADC: int, bp: int, bc: int,
                       xr, yr, c0, c1, c2):
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
    px = jnp.clip(xr, -float(xl), float(xh) - 1e-5)
    fxf = jnp.floor(px)
    fx = fxf.astype(jnp.int32)
    wxc = px - fxf
    wxf = 1.0 - wxc
    py = jnp.clip(yr, -float(yl), float(yh) - 1e-5)
    fyf = jnp.floor(py)
    fy = fyf.astype(jnp.int32)
    wyc = py - fyf
    wyf = 1.0 - wyc

    # per-dx x-weight planes, rows pre-sliced to the output range,
    # full (source-aligned) columns
    WX = []
    for dx in range(-xl, xh + 1):
        rs = PADR - dx
        sub_fx = fx[rs:rs + bp, :]
        WX.append(jnp.where(sub_fx == dx, wxf[rs:rs + bp, :], 0.0)
                  + jnp.where(sub_fx == dx - 1, wxc[rs:rs + bp, :], 0.0))

    acc0 = jnp.zeros((bp, bc), c0.dtype)
    acc1 = jnp.zeros((bp, bc), c0.dtype)
    acc2 = jnp.zeros((bp, bc), c0.dtype)
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
    return acc0, acc1, acc2


def _accum_kernel(xl: int, xh: int, yl: int, yh: int,
                  PADR: int, PADC: int, bp: int, bc: int,
                  xr_ref, yr_ref, c0_ref, c1_ref, c2_ref,
                  out0_ref, out1_ref, out2_ref):
    acc0, acc1, acc2 = _gather_accumulate(
        xl, xh, yl, yh, PADR, PADC, bp, bc,
        xr_ref[:], yr_ref[:], c0_ref[:], c1_ref[:], c2_ref[:])
    out0_ref[:] = acc0
    out1_ref[:] = acc1
    out2_ref[:] = acc2


def _check_halo_fits(xl: int, xh: int, yl: int, yh: int, PADR: int) -> None:
    """The column pad is fixed at 64 lanes (PADC, a (8,128)-tile
    half-width): a y halo beyond it would make the slab writes index with
    a *negative* Python offset — silently wrapping and corrupting the
    deposit instead of failing.  (The row pad PADR is derived as
    ``max(4, ceil(max(xl, xh)/4)*4)`` at every call site, so it always
    covers the x halo — only the column capacity is a real constraint.)
    Oversized halos are a config error (CIC displaces <= a few cells per
    DT), so raise loudly."""
    assert max(xl, xh) <= PADR, "PADR must be derived from the x halo"
    if max(yl, yh) > 64:
        raise ValueError(
            f"CIC halo (({xl},{xh}),({yl},{yh})) exceeds the Pallas gather "
            f"kernel's column pad capacity (y<=64). Such displacements "
            f"(>64 cells/DT) are far beyond the model's CFL regime; reduce "
            f"`halo` or use scatter_mode='dense'/'xla'.")


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
    _check_halo_fits(xl, xh, yl, yh, PADR)

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
        block_y = _best_block_y(nyp, bp, PADR, PADC)
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


def _best_block_y(ny: int, bp: int, PADR: int, PADC: int,
                  n_core: int = 3) -> int:
    """Column-block width minimizing HBM bytes under the scoped-VMEM limit.

    Every input window pays a fixed 2*PADC=128-lane surcharge per column
    block (fewer/wider blocks amortize it), but a bc that does not divide
    ny wastes ``ny_pad - ny`` lanes on all 5 inputs and the core-aligned
    planes (e.g. full-width-capped bc=1664 at ny=3072 pads to 3328 — 8%
    waste — while bc=1536 tiles exactly).  Minimize the actual per-plane
    traffic ``5 * n_blocks * (bc + 2*PADC) + n_core * ny_pad`` over
    128-multiples that fit Mosaic's scoped stack (I/O x1.9 for
    window-sized temporaries, measured 26.58 MB actual vs 14.5 MB
    I/O-only at 3072^2).  ``n_core`` counts the [bp, bc] core-aligned
    in/out planes (3 for the plain gather; ~22 for the fused
    gather+remesh kernel).
    """
    budget = 15 * 1024 * 1024
    full = 128 * ((ny + 127) // 128)

    def vmem(bc):
        io = (5 * (bp + 2 * PADR) * (bc + 2 * PADC)
              + n_core * bp * bc) * 4 * 2
        return (io * 19) // 10

    def traffic(bc):
        nblk = (ny + bc - 1) // bc
        return 5 * nblk * (bc + 2 * PADC) + n_core * nblk * bc

    cands = [bc for bc in range(256, full + 1, 128) if vmem(bc) <= budget]
    if not cands:
        return 256
    return min(cands, key=lambda bc: (traffic(bc), -bc))


def scatter_core_channels_pallas(
        xrel: jnp.ndarray, yrel: jnp.ndarray, charge, active: jnp.ndarray,
        stats, halo, *, block_x: int = 64, block_y: int = 0,
        interpret: bool = False) -> Tuple[Tuple[jnp.ndarray, ...], ScatterStats]:
    """Boundary-folded CIC deposit in ONE gather pass: returns core
    [nx, ny] planes directly, no padded accumulator and no post-fold.

    The padded-accumulator path costs ~12 extra HBM plane passes (slice
    copies + halo-slab adds) after the gather.  Here the *inputs* are
    extended with boundary-aware slabs instead, so each output tile's
    gather window already sees every contribution that would have folded
    onto it:

    - periodic axis: slabs are wrapped copies of the opposite edge,
    - non-periodic axis: zero slabs (out-of-domain deposits drop,
      reference ParticleInCell.jl:351-355),
    - tripolar north seam: mirrored ghost slabs.  A deposit crossing the
      seam folds to ``gy' = 2*ny - 1 - gy`` with the x index flipped
      (``gx' = (nx - 2 - gx) mod nx``, TripolarNorthBoundary,
      ParticleInCell.jl:409-428).  The reflection ``y_abs -> 2*ny-1-y_abs``,
      ``x_abs -> nx-2-x_abs`` maps CIC floor/ceil deposits of the real
      particle exactly onto the folded targets (the fractional weight
      flips with the coordinate), so a ghost copy of the top rows — node
      flipped via the seam map, relative offsets negated — reproduces the
      fold bit-for-bit in gather form.  Ghosts deposit in mirrored
      directions, so the gather window is widened to the symmetric
      ``max(lo, hi)`` per axis for tripolar grids only.

    Positions are pre-clipped to the declared halo capacity (violations
    counted in ``ScatterStats.clamped``), so the kernel's wider in-window
    clip never re-clamps a real or ghost particle.
    """
    ins, clamped, g = _gather_setup(xrel, yrel, charge, active, stats, halo,
                                    block_x, block_y, 3)
    nx, ny = g["nx"], g["ny"]
    bp, bc = g["bp"], g["bc"]

    grid = (g["nx_pad"] // bp, g["ny_pad"] // bc)
    in_specs = [_window_spec(g) for _ in ins]
    out_spec = pl.BlockSpec((bp, bc), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((g["nx_pad"], g["ny_pad"]), ins[2].dtype)
    kernel = functools.partial(_accum_kernel, g["kxl"], g["kxh"], g["kyl"],
                               g["kyh"], g["PADR"], g["PADC"], bp, bc)
    o0, o1, o2 = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(f32, f32, f32),
        interpret=interpret,
    )(*ins)
    return ((o0[:nx, :ny], o1[:nx, :ny], o2[:nx, :ny]),
            ScatterStats(clamped=clamped))


def _window_spec(g):
    bp, bc = g["bp"], g["bc"]
    win_rows = bp + 2 * g["PADR"]
    win_cols = bc + 2 * g["PADC"]
    return pl.BlockSpec((pl.Element(win_rows), pl.Element(win_cols)),
                        lambda i, j: (i * bp, j * bc),
                        memory_space=pltpu.VMEM)


def _gather_setup(xrel, yrel, charge, active, stats, halo,
                  block_x: int, block_y: int, n_core: int):
    """Shared geometry + boundary-extended input planes of the one-pass
    gather kernels.  Returns (ins, clamped, geom-dict)."""
    from .pic import normalize_halo
    from ..grids.base import Boundary

    chans = (charge if isinstance(charge, tuple)
             else tuple(charge[..., i] for i in range(3)))
    assert len(chans) == 3, "pallas accumulate kernel is specialized to 3 channels"
    nx, ny = chans[0].shape
    (xl, xh), (yl, yh) = normalize_halo(halo)

    clamped = jnp.sum(((xrel < -float(xl)) | (xrel > float(xh) - 1e-5)
                       | (yrel < -float(yl)) | (yrel > float(yh) - 1e-5))
                      & active)
    xr = jnp.clip(xrel, -float(xl), float(xh) - 1e-5)
    yr = jnp.clip(yrel, -float(yl), float(yh) - 1e-5)
    act = active.astype(chans[0].dtype)
    ch = [c * act for c in chans]

    tripolar = stats.by == Boundary.TRIPOLAR_NORTH
    if tripolar:
        mx, my = max(xl, xh), max(yl, yh)
        kxl = kxh = mx
        kyl = kyh = my
    else:
        kxl, kxh, kyl, kyh = xl, xh, yl, yh

    H_row = max(kxl, kxh)
    PADR = max(4, ((H_row + 3) // 4) * 4)
    PADC = 64
    _check_halo_fits(kxl, kxh, kyl, kyh, PADR)

    # --- tile geometry: core output [nx, ny]; the extended input sits at
    # offset (PADR, PADC) inside the padded plane
    bp = min(block_x, 8 * ((nx + 7) // 8))
    bp = max(8, (bp // 8) * 8)
    nx_pad = ((nx + bp - 1) // bp) * bp
    if block_y <= 0:
        block_y = _best_block_y(ny, bp, PADR, PADC, n_core)
    bc = min(block_y, 128 * ((ny + 127) // 128))
    ny_pad = ((ny + bc - 1) // bc) * bc

    # --- build each padded plane as ONE buffer with in-place slab writes
    # (a concat/pad chain materializes the plane 2-3x; dynamic-update-
    # slices keep it to the single unavoidable copy)
    R, C = nx_pad + 2 * PADR, ny_pad + 2 * PADC
    r0, c0 = PADR, PADC

    def build(a, negate_ghost):
        # full-x column slabs (y axis): wrap copies or mirrored seam
        # ghosts (the seam flip spans the whole x axis, so slabs are
        # computed at full x and the corner strips sliced from them)
        lo = jnp.zeros((nx, kyh), a.dtype)
        hi = jnp.zeros((nx, kyl), a.dtype)
        if stats.by == Boundary.PERIODIC:
            if kyh > 0:
                lo = a[:, ny - kyh:]
            if kyl > 0:
                hi = a[:, :kyl]
        elif tripolar and kyl > 0:
            # ghost col ny+k mirrors core col ny-1-k through the seam
            src = a[:, ny - 1:ny - 1 - kyl:-1] if kyl < ny else a[:, ::-1]
            src = jnp.roll(src[::-1, :], -1, axis=0)  # x seam flip
            hi = -src if negate_ghost else src

        def col_ext(sl):
            return jnp.concatenate([lo[sl], a[sl], hi[sl]], axis=1)

        P = (jnp.zeros((R, C), a.dtype)
             .at[r0:r0 + nx, c0 - kyh:c0 + ny + kyl].set(col_ext(slice(None))))
        # x-wrap strips derive from the full-x slabs (tiny [kx, *] reads),
        # so every update-slice is independent and XLA keeps one buffer
        if stats.bx == Boundary.PERIODIC:
            if kxh > 0:
                P = P.at[r0 - kxh:r0, c0 - kyh:c0 + ny + kyl].set(
                    col_ext(slice(nx - kxh, None)))
            if kxl > 0:
                P = P.at[r0 + nx:r0 + nx + kxl, c0 - kyh:c0 + ny + kyl].set(
                    col_ext(slice(0, kxl)))
        return P

    ins = [build(xr, True), build(yr, True)] + [build(c, False) for c in ch]
    geom = dict(nx=nx, ny=ny, kxl=kxl, kxh=kxh, kyl=kyl, kyh=kyh,
                PADR=PADR, PADC=PADC, bp=bp, bc=bc,
                nx_pad=nx_pad, ny_pad=ny_pad)
    return ins, clamped, geom


def _accum_remesh_kernel(u_wind, v_wind, defaults, bdefaults,
                         boundary_source: bool, timestep: float,
                         minimal_e: float, minimal_m2: float,
                         wind_min_squared: float, dtmin: float, n_wf: int,
                         xl, xh, yl, yh, PADR, PADC, bp, bc, *refs,
                         clip_dt: bool = True):
    from .remesh_pallas import remesh_core

    (time_ref,) = refs[:1]   # SMEM (1, 1) model clock
    (xr_ref, yr_ref, c0_ref, c1_ref, c2_ref) = refs[1:6]      # windows
    (lne_ref, cgx_ref, cgy_ref, px_ref, py_ref, dt_ref,
     on_ref, act_ref, bnd_ref, xn_ref, yn_ref) = refs[6:17]   # core planes
    wf = tuple(r[:] for r in refs[17:17 + n_wf])
    (e_o, mx_o, my_o, lne_o, cgx_o, cgy_o, px_o, py_o, dt_o,
     on_o, br_o) = refs[17 + n_wf:]

    acc0, acc1, acc2 = _gather_accumulate(
        xl, xh, yl, yh, PADR, PADC, bp, bc,
        xr_ref[:], yr_ref[:], c0_ref[:], c1_ref[:], c2_ref[:])
    e_o[:] = acc0
    mx_o[:] = acc1
    my_o[:] = acc2

    outs = remesh_core(
        u_wind, v_wind, defaults, bdefaults, boundary_source,
        timestep, minimal_e, minimal_m2, wind_min_squared, dtmin,
        acc0, acc1, acc2,
        lne_ref[:], cgx_ref[:], cgy_ref[:], px_ref[:], py_ref[:], dt_ref[:],
        on_ref[:] != 0, act_ref[:] != 0, bnd_ref[:] != 0,
        xn_ref[:], yn_ref[:], time_ref[0, 0], wf, clip_dt=clip_dt)
    for ref, val in zip((lne_o, cgx_o, cgy_o, px_o, py_o, dt_o, on_o, br_o),
                        outs):
        ref[:] = val


def scatter_remesh_fused(
        u_wind, v_wind, defaults, bdefaults, boundary_source: bool,
        timestep: float, minimal_e: float, minimal_m2: float,
        wind_min_squared: float, dtmin: float,
        xrel, yrel, charge, scatter_active,
        lne, cgx, cgy, px, py, dt, on, active, boundary, xn, yn,
        time_scalar, stats, halo, *,
        wind_fields: Tuple[jnp.ndarray, ...] = (),
        block_x: int = 64, block_y: int = 0, interpret: bool = False,
        clip_dt: bool = True):
    """Boundary-folded CIC deposit + remesh state machine in ONE kernel.

    The separate remesh (XLA selects or the standalone kernel) re-reads
    the 3 freshly written node planes from HBM; here the per-tile
    accumulators feed the remesh branch table directly from VMEM, so the
    node state is written once and never read back.  Inputs are the 5
    boundary-extended gather windows plus 11 core-aligned particle/mask
    planes; outputs the 3 node planes plus the 8 remesh results.

    Single-chip only: the sharded deposit must halo-exchange BETWEEN the
    local accumulate and the remesh, which forbids this fusion (the
    sharded path keeps the split phases).

    Returns ((e, mx, my), RemeshResult, ScatterStats).
    """
    from .pallas_util import pad_cols, pad_rows
    from .remesh_pallas import RemeshResult

    ins5, clamped, g = _gather_setup(xrel, yrel, charge, scatter_active,
                                     stats, halo, block_x, block_y,
                                     22 + len(wind_fields))
    nx, ny = g["nx"], g["ny"]
    bp, bc = g["bp"], g["bc"]
    nx_pad, ny_pad = g["nx_pad"], g["ny_pad"]

    def pad2(a, fill=None):
        return pad_cols(pad_rows(a, nx_pad, fill=fill), ny_pad, fill=fill)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tarr = jnp.asarray(time_scalar, lne.dtype).reshape(1, 1)

    core = [pad2(a) for a in (lne, cgx, cgy, px, py, dt)]
    core += [pad2(a.astype(jnp.int32), fill=0)
             for a in (on, active, boundary)]
    core += [pad2(a) for a in (xn, yn)]
    core += [pad2(jnp.broadcast_to(jnp.asarray(f, lne.dtype), lne.shape))
             for f in wind_fields]

    core_spec = pl.BlockSpec((bp, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    in_specs = ([smem] + [_window_spec(g) for _ in ins5]
                + [core_spec for _ in core])
    f32 = jax.ShapeDtypeStruct((nx_pad, ny_pad), lne.dtype)
    i32 = jax.ShapeDtypeStruct((nx_pad, ny_pad), jnp.int32)
    out_shape = (f32, f32, f32, f32, f32, f32, f32, f32, f32, i32, i32)

    kernel = functools.partial(
        _accum_remesh_kernel, u_wind, v_wind, defaults, bdefaults,
        boundary_source, timestep, minimal_e, minimal_m2, wind_min_squared,
        dtmin, len(wind_fields),
        g["kxl"], g["kxh"], g["kyl"], g["kyh"], g["PADR"], g["PADC"], bp, bc,
        clip_dt=clip_dt)
    outs = pl.pallas_call(
        kernel, grid=(nx_pad // bp, ny_pad // bc),
        in_specs=in_specs,
        out_specs=tuple(core_spec for _ in out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(tarr, *ins5, *core)
    (e_n, mx_n, my_n, lne_o, cgx_o, cgy_o, px_o, py_o, dt_o, on_o,
     br) = (o[:nx, :ny] for o in outs)
    return ((e_n, mx_n, my_n),
            RemeshResult(lne=lne_o, cgx=cgx_o, cgy=cgy_o, px=px_o, py=py_o,
                         dt=dt_o, on=on_o != 0, branch=br),
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
