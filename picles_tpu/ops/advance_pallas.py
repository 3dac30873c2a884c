"""Pallas fused advance kernel — the whole adaptive ODE sub-step loop in VMEM.

The XLA `integrate_to` while_loop round-trips its full carry through HBM on
every accepted/rejected sub-step and pays per-iteration kernel-launch
overhead.  This kernel instead tiles the particle SoA over x-row blocks,
loads one block's state into VMEM, and runs the *entire* adaptive Tsit5 loop
(accept/reject, PI control, dtmin/force_dtmin, per-lane t/dt) inside the
kernel — pure VPU work with zero intermediate HBM traffic.  Each tile also
converges independently: a quiet tile exits its while_loop after its own
max sub-step count, not the global one.

Constraints:
 - the wind sampler must be elementwise jnp ops over the node coordinates,
   the time, and optional per-node ``wind_fields`` arrays.  Analytic winds
   are closures; gridded winds pass their exact per-DT-window piecewise-
   linear decomposition ``u = a_u + t*s_u + sum_k ds_k*max(t - b_k, 0)``
   as field refs (winds are sampled at the fixed node position, mirroring
   the reference, so time is the only in-kernel variable — see
   GriddedWinds2D.pallas_pwl_fields),
 - semantics match `integrate_to` exactly (same controller constants), so
   the two paths are interchangeable and cross-checked in tests.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rhs import RHSConsts, TermFlags, rhs_core_2d
from .tsit5 import _QMAX, _QMIN, _SAFETY, METHODS, SolverConfig


class PallasAdvanceResult(NamedTuple):
    lne: jnp.ndarray
    cgx: jnp.ndarray
    cgy: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    t: jnp.ndarray
    dt: jnp.ndarray
    failed: jnp.ndarray
    naccept: jnp.ndarray


def _advance_kernel(u_wind, v_wind, consts: RHSConsts, flags: TermFlags,
                    config: SolverConfig, DT: float, uniform, n_wf: int,
                    # refs:
                    *refs):
    (lne_ref, cgx_ref, cgy_ref, x_ref, y_ref, t_ref, dt_ref,
     act_ref, nx_ref, ny_ref) = refs[:10]
    # per-node wind-field refs (gridded winds linearized over the DT
    # window: the samplers read these instead of an analytic closure)
    wf = tuple(r[:] for r in refs[10:10 + n_wf])
    rest = refs[10 + n_wf:]
    if uniform is None:
        (m00_ref, m01_ref, m10_ref, m11_ref, pc_ref) = rest[:5]
        (lne_o, cgx_o, cgy_o, x_o, y_o, t_o, dt_o, fail_o, nacc_o) = rest[5:]
        m00, m01, m10, m11 = m00_ref[:], m01_ref[:], m10_ref[:], m11_ref[:]
        pc = pc_ref[:]
    else:
        # uniform grid: projection matrix + great-circle coefficient are
        # spatially constant — baked in as scalars, 5 fewer HBM streams
        (lne_o, cgx_o, cgy_o, x_o, y_o, t_o, dt_o, fail_o, nacc_o) = rest
        m00, m01, m10, m11, pc = uniform
    lne0, cgx0, cgy0 = lne_ref[:], cgx_ref[:], cgy_ref[:]
    px0, py0 = x_ref[:], y_ref[:]
    t0, dt0 = t_ref[:], dt_ref[:]
    active = act_ref[:] != 0
    xn, yn = nx_ref[:], ny_ref[:]

    t_end = t0 + DT

    def rhs(t, lne, cgx, cgy):
        u = u_wind(xn, yn, t, *wf)
        v = v_wind(xn, yn, t, *wf)
        u = jnp.broadcast_to(jnp.asarray(u, lne.dtype), lne.shape)
        v = jnp.broadcast_to(jnp.asarray(v, lne.dtype), lne.shape)
        return rhs_core_2d(lne, cgx, cgy, u, v, m00, m01, m10, m11, pc,
                           consts, flags)

    zeros_i = jnp.zeros_like(t0, dtype=jnp.int32)
    # Mosaic cannot carry vector-of-bool through a while_loop: track
    # done/failed as int32 masks inside the kernel.
    done0 = ((~active) | (t0 >= t_end)).astype(jnp.int32)
    k1_0 = rhs(t0, lne0, cgx0, cgy0)

    def cond(c):
        (lne, cgx, cgy, px, py, t, dt, k1, done, failed, nacc, iters) = c
        return (~jnp.all(done != 0)) & (iters < config.maxiters)

    def body(c):
        (lne, cgx, cgy, px, py, t, dt, k1, done_i, failed_i, nacc, iters) = c
        done = done_i != 0
        failed = failed_i != 0
        live = ~done
        remaining = t_end - t
        # spacing-aware floor: a dt below ulp(t) cannot advance the f32
        # clock (t + dt rounds to t), so forced-dtmin steps at large model
        # time would spin to maxiters — mirror of tsit5.integrate_to
        dtmin_eff = jnp.maximum(
            config.dtmin,
            4.0 * jnp.finfo(t.dtype).eps
            * jnp.maximum(jnp.abs(t), jnp.abs(t_end)))
        dt_try = jnp.clip(dt, dtmin_eff,
                          jnp.maximum(remaining, dtmin_eff))
        at_dtmin = dt_try <= dtmin_eff * (1.0 + 1e-8)

        z = (lne, cgx, cgy, px, py)
        method = METHODS[config.method]

        def fma(coeffs, ks):
            # z + dt * sum(a_i k_i), componentwise over the 5 state vars
            out = []
            for comp in range(5):
                acc = z[comp]
                for a, k in zip(coeffs, ks):
                    if a != 0.0:
                        acc = acc + dt_try * a * k[comp]
                out.append(acc)
            return tuple(out)

        # generic embedded-RK stage unroll (trace-time loop over the tableau)
        ks = [k1]
        for ci, row in zip(method.c, method.a):
            ks.append(rhs(t + ci * dt_try, *fma(row, ks)[:3]))
        z_new = fma(method.b, ks)
        ks.append(rhs(t + dt_try, *z_new[:3]))  # FSAL

        if config.adaptive:
            # scaled error norm over the 5 components
            err_sq = jnp.zeros_like(t)
            finite = jnp.ones_like(done)
            for comp in range(5):
                e = jnp.zeros_like(t)
                for bt, k in zip(method.bt, ks):
                    if bt != 0.0:
                        e = e + bt * k[comp]
                e = dt_try * e
                sc = (config.abstol + config.reltol
                      * jnp.maximum(jnp.abs(z[comp]), jnp.abs(z_new[comp])))
                err_sq = err_sq + (e / sc) ** 2
                finite = finite & jnp.isfinite(z_new[comp])
            enorm = jnp.sqrt(err_sq / 5.0)
            finite = finite & jnp.isfinite(enorm)

            accept = (enorm <= 1.0) & finite
            if config.force_dtmin:
                accept = accept | at_dtmin
            newly_failed = live & at_dtmin & ~accept

            enorm_safe = jnp.maximum(enorm, 1e-10)
            q = _SAFETY * enorm_safe ** (-1.0 / method.order)
            q = jnp.where(finite, q, _QMIN)
            factor = jnp.clip(q, _QMIN, _QMAX)
            dt_next = jnp.where(accept, dt_try * factor,
                                jnp.maximum(dt_try * jnp.clip(q, _QMIN, 1.0),
                                            dtmin_eff))
        else:
            # fixed-substep mode (ODESettings.adaptive=False): accept every
            # step, dt carried unchanged (see tsit5.integrate_to)
            accept = jnp.ones_like(done, dtype=bool)
            newly_failed = jnp.zeros_like(done, dtype=bool)
            dt_next = dt

        upd = live & accept
        t_new = jnp.where(upd, t + dt_try, t)
        out = tuple(jnp.where(upd, zn, zo) for zn, zo in zip(z_new, z))
        dt_out = jnp.where(live, dt_next, dt)
        k1_out = tuple(jnp.where(upd, kn, ko) for kn, ko in zip(ks[-1], k1))
        done_new = done | (live & (t_new >= t_end - 1e-9)) | newly_failed

        return (out[0], out[1], out[2], out[3], out[4], t_new, dt_out,
                k1_out, done_new.astype(jnp.int32),
                (failed | newly_failed).astype(jnp.int32),
                nacc + upd.astype(jnp.int32), iters + 1)

    init = (lne0, cgx0, cgy0, px0, py0, t0, dt0, k1_0, done0,
            jnp.zeros_like(done0), zeros_i, jnp.zeros((), jnp.int32))
    (lne, cgx, cgy, px, py, t, dt, _k1, done_i, failed_i, nacc,
     _it) = jax.lax.while_loop(cond, body, init)

    done = done_i != 0
    failed = (failed_i != 0) | (~done & active)
    lne_o[:] = lne
    cgx_o[:] = cgx
    cgy_o[:] = cgy
    x_o[:] = px
    y_o[:] = py
    t_o[:] = jnp.where(active & ~failed, t_end, t)
    dt_o[:] = dt
    fail_o[:] = failed.astype(jnp.int32)
    nacc_o[:] = nacc


def _auto_dt_kernel(u_wind, v_wind, consts: RHSConsts, flags: TermFlags,
                    abstol: float, reltol: float, order: float, max_dt: float,
                    uniform, n_wf: int, *refs):
    (lne_ref, cgx_ref, cgy_ref, x_ref, y_ref, t_ref, nx_ref, ny_ref) = refs[:8]
    wf = tuple(r[:] for r in refs[8:8 + n_wf])
    rest = refs[8 + n_wf:]
    if uniform is None:
        (m00_ref, m01_ref, m10_ref, m11_ref, pc_ref, out_ref) = rest
        m00, m01, m10, m11 = m00_ref[:], m01_ref[:], m10_ref[:], m11_ref[:]
        pc = pc_ref[:]
    else:
        (out_ref,) = rest
        m00, m01, m10, m11, pc = uniform
    lne, cgx, cgy = lne_ref[:], cgx_ref[:], cgy_ref[:]
    px, py = x_ref[:], y_ref[:]
    t = t_ref[:]
    xn, yn = nx_ref[:], ny_ref[:]

    def rhs(tt, a, b, c):
        u = u_wind(xn, yn, tt, *wf)
        v = v_wind(xn, yn, tt, *wf)
        u = jnp.broadcast_to(jnp.asarray(u, a.dtype), a.shape)
        v = jnp.broadcast_to(jnp.asarray(v, a.dtype), a.shape)
        return rhs_core_2d(a, b, c, u, v, m00, m01, m10, m11, pc,
                           consts, flags)

    tiny = jnp.asarray(1e-10, lne.dtype)
    z = (lne, cgx, cgy, px, py)
    sc = tuple(abstol + jnp.abs(zi) * reltol for zi in z)
    f0 = rhs(t, lne, cgx, cgy)

    def norm(vs):
        s = jnp.zeros_like(t)
        for vi, sci in zip(vs, sc):
            s = s + (vi / sci) ** 2
        return jnp.sqrt(s / 5.0)

    d0 = norm(z)
    d1 = norm(f0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6,
                   0.01 * d0 / jnp.maximum(d1, tiny))

    z1 = tuple(zi + h0 * fi for zi, fi in zip(z, f0))
    f1 = rhs(t + h0, z1[0], z1[1], z1[2])
    d2 = norm(tuple(a - b for a, b in zip(f1, f0))) / jnp.maximum(h0, tiny)

    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(dmax <= 1e-15,
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(dmax, tiny)) ** (1.0 / (order + 1.0)))
    out_ref[:] = jnp.minimum(jnp.minimum(100.0 * h0, h1), max_dt)


def auto_dt_pallas(u_wind: Callable, v_wind: Callable, consts: RHSConsts,
                   flags: TermFlags, t: jnp.ndarray, z: jnp.ndarray,
                   xn, yn, proj, pc, *, abstol: float = 1e-4,
                   reltol: float = 1e-3, order: float = 5.0,
                   max_dt: float = 3600.0, block_x: int = 0,
                   wind_fields: Tuple[jnp.ndarray, ...] = (),
                   interpret: bool = False) -> jnp.ndarray:
    """Fused Hairer initial-dt estimate (semantics of ``tsit5.auto_dt``).

    The XLA version round-trips ~15 intermediate arrays through HBM for its
    two RHS evaluations; this kernel keeps everything in VMEM.  Tiled like
    ``advance_pallas``; same wind-sampler contract (see ``advance_pallas``).
    """
    from .pallas_util import auto_block_x, pad_rows, row_block

    nx, ny = t.shape
    if block_x <= 0:
        # measured stack (see auto_block_x) + extra wind-field streams
        block_x = auto_block_x(ny, 64 + 2 * len(wind_fields))
    bx, nx_pad = row_block(nx, block_x)
    grid = (nx_pad // bx,)

    def spec():
        return pl.BlockSpec((bx, ny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    uniform = proj if isinstance(proj, tuple) else None
    comps = z if isinstance(z, tuple) else tuple(z[..., i] for i in range(5))
    ins = [*comps, t, xn, yn]
    ins += [jnp.broadcast_to(jnp.asarray(f, t.dtype), t.shape)
            for f in wind_fields]
    if uniform is None:
        ins += [proj[..., 0, 0], proj[..., 0, 1], proj[..., 1, 0],
                proj[..., 1, 1], pc]
    ins = [pad_rows(a, nx_pad) for a in ins]  # edge rows: finite RHS
    kernel = functools.partial(_auto_dt_kernel, u_wind, v_wind, consts,
                               flags, abstol, reltol, order, max_dt, uniform,
                               len(wind_fields))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec() for _ in ins],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((nx_pad, ny), t.dtype),
        interpret=interpret,
    )(*ins)[:nx]


def advance_pallas(u_wind: Callable, v_wind: Callable, consts: RHSConsts,
                   flags: TermFlags, config: SolverConfig, DT: float,
                   z: jnp.ndarray, t: jnp.ndarray, dt: jnp.ndarray,
                   active: jnp.ndarray, xn, yn, proj, pc,
                   block_x: int = 0,
                   wind_fields: Tuple[jnp.ndarray, ...] = (),
                   interpret: bool = False) -> PallasAdvanceResult:
    """Run the fused advance over ``[nx, ny]`` particle arrays.

    z: [nx, ny, 5]; returns component arrays (see PallasAdvanceResult).
    ``block_x = 0`` sizes the x-block automatically from a VMEM budget
    (~45 live f32 lanes through the Tsit5 stages).

    Wind sampler contract: ``u_wind(xn, yn, t, *wind_fields)`` where
    ``wind_fields`` are per-node ``[nx, ny]`` arrays streamed into VMEM
    alongside the particle state.  Analytic winds ignore the fields
    (pass ``()``); gridded winds pass their exact piecewise-linear
    decomposition (see forcing.winds.GriddedWinds2D.pallas_pwl_fields).
    """
    from .pallas_util import (auto_block_x, col_block, pad_cols, pad_rows,
                              row_block)

    nx, ny = t.shape
    ny_lanes = ((ny + 127) // 128) * 128
    # VMEM stack: 93 f32-buffer units measured with NO wind-field planes
    # (constant winds); each extra field adds an input stream (x2 for
    # Mosaic's double buffering)
    n_buf = 93 + 2 * len(wind_fields)
    # very wide grids (auto mode): full-width row blocks would shrink
    # below ~16 rows and lose sublane efficiency (measured +12% at
    # 3072^2) — tile columns too, keeping ~24-row blocks.
    bc = col_block(ny, n_buf) if block_x <= 0 else ny_lanes
    two_d = bc < ny_lanes
    if block_x <= 0:
        block_x = auto_block_x(bc if two_d else ny, n_buf)
    # 8-aligned block + row padding: any nx (incl. primes) tiles cleanly
    bx, nx_pad = row_block(nx, block_x)
    if two_d:
        ny_pad = ((ny + bc - 1) // bc) * bc
        grid = (nx_pad // bx, ny_pad // bc)

        def spec():
            return pl.BlockSpec((bx, bc), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
    else:
        ny_pad = ny
        grid = (nx_pad // bx,)

        def spec():
            return pl.BlockSpec((bx, ny), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

    def pad(a, fill=None):
        a = pad_rows(a, nx_pad, fill=fill)
        return pad_cols(a, ny_pad, fill=fill) if two_d else a

    # tuple proj = (m00, m01, m10, m11, pc) python floats for spatially
    # uniform grids: 5 fewer HBM input streams
    uniform = proj if isinstance(proj, tuple) else None
    # z: either a stacked [nx, ny, 5] array or a 5-tuple of [nx, ny]
    # component planes (preferred — avoids the stacked layout round-trip)
    comps = z if isinstance(z, tuple) else tuple(z[..., i] for i in range(5))
    # padded lanes are inactive (mask fill 0) -> done at iteration 0;
    # state/coords replicate the edge row so their RHS stays finite
    ins = [pad(a) for a in (*comps, t, dt)]
    ins += [pad(active.astype(jnp.int32), fill=0), pad(xn), pad(yn)]
    ins += [pad(jnp.broadcast_to(jnp.asarray(f, t.dtype), t.shape))
            for f in wind_fields]
    if uniform is None:
        ins += [pad(a)
                for a in (proj[..., 0, 0], proj[..., 0, 1], proj[..., 1, 0],
                          proj[..., 1, 1], pc)]

    f32 = jax.ShapeDtypeStruct((nx_pad, ny_pad), t.dtype)
    i32 = jax.ShapeDtypeStruct((nx_pad, ny_pad), jnp.int32)
    out_shape = (f32, f32, f32, f32, f32, f32, f32, i32, i32)

    kernel = functools.partial(_advance_kernel, u_wind, v_wind, consts,
                               flags, config, DT, uniform, len(wind_fields))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec() for _ in ins],
        out_specs=tuple(spec() for _ in out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    (lne, cgx, cgy, px, py, t_o, dt_o, fail, nacc) = (
        o[:nx, :ny] for o in outs)
    return PallasAdvanceResult(lne=lne, cgx=cgx, cgy=cgy, x=px, y=py, t=t_o,
                               dt=dt_o, failed=fail != 0, naccept=nacc)
