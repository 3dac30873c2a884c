"""Pallas fused remesh kernel — gather/reseed/off state machine in VMEM.

The remesh phase (reference NodeToParticle!, mapping_2D.jl:279-356) is pure
elementwise work, but as XLA glue it spreads over ~8 separate fusions, each
a full HBM pass over the particle planes (~0.25 ms/step at 1536^2).  This
kernel runs the whole branch table — node-state gather, windsea reseed,
switch-off, position zeroing, warm-restart dt clip — in one VMEM pass.

Contracts:
 - wind samplers are the same elementwise closures as the advance kernel:
   ``u_wind(xn, yn, t, *wind_fields)``; the model clock enters through SMEM
   so gridded winds' per-step linearization stays exact,
 - the windsea reseed calls the same pure-jnp ``fetch_relations`` code the
   XLA path uses, so both remesh backends are numerically identical
   (cross-checked in tests),
 - only ``dt_reset_mode="carry"`` is supported (the production config);
   the Hairer auto-dt path needs RHS evaluations and stays on
   ``auto_dt_pallas`` + XLA selects.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import fetch_relations as FR

# branch bitfield values (metrics decode)
GATHER_BIT = 1
RESEED_BIT = 2
OFF_BIT = 4


class RemeshResult(NamedTuple):
    lne: jnp.ndarray
    cgx: jnp.ndarray
    cgy: jnp.ndarray
    px: jnp.ndarray
    py: jnp.ndarray
    dt: jnp.ndarray
    on: jnp.ndarray        # bool
    branch: jnp.ndarray    # int32 bitfield (GATHER/RESEED/OFF bits)


def remesh_core(u_wind: Callable, v_wind: Callable, defaults, bdefaults,
                boundary_source: bool,
                timestep: float, minimal_e: float, minimal_m2: float,
                wind_min_squared: float, dtmin: float,
                e_n, mx_n, my_n, lne, cgx, cgy, px, py, dt,
                on, active, boundary, xn, yn, t_i, wf, clip_dt: bool = True):
    """The remesh branch table on plain arrays (usable inside any Pallas
    kernel as well as the standalone one below).  ``on/active/boundary``
    are bool arrays; returns (lne, cgx, cgy, px, py, dt, on_i32, branch).
    ``clip_dt=False`` carries dt untouched (fixed-substep mode)."""
    u_i = u_wind(xn, yn, t_i, *wf)
    v_i = v_wind(xn, yn, t_i, *wf)
    u_i = jnp.broadcast_to(jnp.asarray(u_i, lne.dtype), lne.shape)
    v_i = jnp.broadcast_to(jnp.asarray(v_i, lne.dtype), lne.shape)
    wind2 = u_i ** 2 + v_i ** 2

    m2_n = mx_n ** 2 + my_n ** 2
    # boundary-source mode: boundary nodes join the remesh state machine
    # (open-boundary inflow, see WaveGrowth2D boundary_type notes)
    part = (active | boundary) if boundary_source else active
    gather = (part & ~boundary & (e_n >= minimal_e) & (m2_n >= minimal_m2))
    reseed = part & ~gather & (wind2 >= wind_min_squared)
    go_off = part & ~gather & ~reseed

    # node -> particle transform — the shared elementwise function is
    # Pallas-safe, so both remesh backends literally run the same code
    from .transforms import node_to_particle

    lne_g, cgx_g, cgy_g = node_to_particle(e_n, mx_n, my_n)

    def _seed_vals(d):
        if d is None:
            ws = FR.get_initial_windsea(u_i, v_i, timestep)
            return (ws.lne.astype(lne.dtype), ws.cg_bar_x.astype(lne.dtype),
                    ws.cg_bar_y.astype(lne.dtype))
        return (jnp.full_like(lne, d[0]), jnp.full_like(lne, d[1]),
                jnp.full_like(lne, d[2]))

    lne_s, cgx_s, cgy_s = _seed_vals(defaults)
    if bdefaults != "same":
        # boundary reseed branch uses the boundary defaults
        # (mapping_2D.jl:338-345 + WaveGrowthModels2D.jl:273-292)
        lne_b, cgx_b, cgy_b = _seed_vals(bdefaults)
        lne_s = jnp.where(boundary, lne_b, lne_s)
        cgx_s = jnp.where(boundary, cgx_b, cgx_s)
        cgy_s = jnp.where(boundary, cgy_b, cgy_s)

    lne_r = jnp.where(gather, lne_g, jnp.where(reseed, lne_s, lne))
    cgx_r = jnp.where(gather, cgx_g, jnp.where(reseed, cgx_s, cgx))
    cgy_r = jnp.where(gather, cgy_g, jnp.where(reseed, cgy_s, cgy))
    moved = gather | reseed
    px_r = jnp.where(moved, 0.0, px)
    py_r = jnp.where(moved, 0.0, py)
    # warm-restart dt (dt_reset_mode="carry"); fixed-substep mode
    # (ODESettings.adaptive=False) carries dt untouched, mirroring the
    # XLA tail's `if not sett.adaptive: pass` (wave_growth_2d.py) so both
    # remesh backends take identical substep sequences
    dt_r = jnp.clip(dt, dtmin, timestep) if clip_dt else dt
    # Mosaic cannot select between i1 vectors: do it in i32
    on_r = jnp.where(part, moved.astype(jnp.int32), on.astype(jnp.int32))
    br = (jnp.where(gather, GATHER_BIT, 0)
          + jnp.where(reseed, RESEED_BIT, 0)
          + jnp.where(go_off, OFF_BIT, 0)).astype(jnp.int32)
    return lne_r, cgx_r, cgy_r, px_r, py_r, dt_r, on_r, br


def _remesh_kernel(u_wind: Callable, v_wind: Callable, defaults, bdefaults,
                   boundary_source: bool,
                   timestep: float, minimal_e: float, minimal_m2: float,
                   wind_min_squared: float, dtmin: float, n_wf: int,
                   *refs, clip_dt: bool = True):
    (time_ref,) = refs[:1]  # SMEM (1, 1) model clock
    (e_ref, mx_ref, my_ref, lne_ref, cgx_ref, cgy_ref, px_ref, py_ref,
     dt_ref, on_ref, act_ref, bnd_ref, xn_ref, yn_ref) = refs[1:15]
    wf = tuple(r[:] for r in refs[15:15 + n_wf])
    (lne_o, cgx_o, cgy_o, px_o, py_o, dt_o, on_o, br_o) = refs[15 + n_wf:]

    outs = remesh_core(
        u_wind, v_wind, defaults, bdefaults, boundary_source,
        timestep, minimal_e, minimal_m2, wind_min_squared, dtmin,
        e_ref[:], mx_ref[:], my_ref[:],
        lne_ref[:], cgx_ref[:], cgy_ref[:], px_ref[:], py_ref[:], dt_ref[:],
        on_ref[:] != 0, act_ref[:] != 0, bnd_ref[:] != 0,
        xn_ref[:], yn_ref[:], time_ref[0, 0], wf, clip_dt=clip_dt)
    for ref, val in zip((lne_o, cgx_o, cgy_o, px_o, py_o, dt_o, on_o, br_o),
                        outs):
        ref[:] = val


def remesh_pallas(u_wind: Callable, v_wind: Callable,
                  defaults: Optional[Tuple[float, float, float]],
                  timestep: float, minimal_e: float, minimal_m2: float,
                  wind_min_squared: float, dtmin: float,
                  node_state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                  lne, cgx, cgy, px, py, dt, on, active, boundary,
                  xn, yn, time_scalar,
                  wind_fields: Tuple[jnp.ndarray, ...] = (),
                  block_x: int = 0,
                  interpret: bool = False,
                  boundary_defaults="same",
                  boundary_source: bool = False,
                  clip_dt: bool = True) -> RemeshResult:
    """Fused remesh over [nx, ny] planes.

    ``defaults``: None for windsea reseeding, or (lne, cgx, cgy) floats for
    fixed ParticleDefaults.  ``boundary_defaults``: "same" (boundary nodes
    reseed like the interior), None (boundary reseeds from windsea), or an
    (lne, cgx, cgy) tuple.  ``time_scalar``: the model clock (traced scalar,
    enters via SMEM).
    """
    from .pallas_util import auto_block_x, pad_rows, row_block

    nx, ny = lne.shape
    if block_x <= 0:
        # measured stack (see auto_block_x) + extra wind-field streams
        block_x = auto_block_x(ny, 64 + 2 * len(wind_fields))
    bx, nx_pad = row_block(nx, block_x)
    grid = (nx_pad // bx,)

    def spec():
        return pl.BlockSpec((bx, ny), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tarr = jnp.asarray(time_scalar, lne.dtype).reshape(1, 1)

    e_n, mx_n, my_n = node_state
    # padded lanes: active/boundary/on fill 0 -> pure pass-through rows
    ins = [tarr]
    ins += [pad_rows(a, nx_pad)
            for a in (e_n, mx_n, my_n, lne, cgx, cgy, px, py, dt)]
    ins += [pad_rows(a.astype(jnp.int32), nx_pad, fill=0)
            for a in (on, active, boundary)]
    ins += [pad_rows(a, nx_pad) for a in (xn, yn)]
    ins += [pad_rows(jnp.broadcast_to(jnp.asarray(f, lne.dtype), lne.shape),
                     nx_pad)
            for f in wind_fields]

    f32 = jax.ShapeDtypeStruct((nx_pad, ny), lne.dtype)
    i32 = jax.ShapeDtypeStruct((nx_pad, ny), jnp.int32)
    out_shape = (f32, f32, f32, f32, f32, f32, i32, i32)

    kernel = functools.partial(_remesh_kernel, u_wind, v_wind, defaults,
                               boundary_defaults, boundary_source,
                               timestep, minimal_e, minimal_m2,
                               wind_min_squared, dtmin, len(wind_fields),
                               clip_dt=clip_dt)
    outs = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[smem] + [spec() for _ in ins[1:]],
        out_specs=tuple(spec() for _ in out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    (lne_o, cgx_o, cgy_o, px_o, py_o, dt_o, on_o, br) = (o[:nx] for o in outs)
    return RemeshResult(lne=lne_o, cgx=cgx_o, cgy=cgy_o, px=px_o, py=py_o,
                        dt=dt_o, on=on_o != 0, branch=br)
