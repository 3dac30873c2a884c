"""On-chip numerics validation of every Pallas kernel against its XLA twin.

The CPU test suite runs the kernels in interpret mode, which cannot catch
Mosaic lowering bugs (tile alignment, lane padding, scoped-VMEM layout).
This script compiles the real kernels on the attached TPU and asserts
parity with the pure-XLA paths:

  1. CIC gather deposit vs XLA dense scatter — every boundary family
     (periodic / nonperiodic / tripolar seam) x symmetric + asymmetric +
     zero-lo halos, at aligned and awkward (prime) sizes,
  2. one full model step, pallas config vs XLA config,
  3. standalone remesh kernel vs the XLA remesh,
  4. fused gather+remesh kernel vs the split phases,
  5. gridded winds via the exact PWL fields at a frame-straddling cadence,
  6. the layered (vmapped) step through the Mosaic kernels.

Exit code 0 = all checks pass.  Run:  python benchmark/tpu_numerics_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/picles_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds
from picles_tpu.grids.base import Boundary, GridStats
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig
from picles_tpu.ops import pic

PASS = 0


def check(name, a, b, rtol, atol=1e-6):
    global PASS
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol,
                               atol=atol, err_msg=name)
    PASS += 1
    print(f"  ok: {name}")


def check_scatter():
    print("[1/6] CIC gather vs XLA dense scatter")
    rng = np.random.default_rng(0)
    # kept small: every (size, halo, boundary) combo is a fresh Mosaic
    # compile through the tunnel (~5-10 s each)
    cases = [(127, 61), (360, 180)]
    halos = [3, ((0, 3), (0, 3)), ((1, 2), (2, 1))]
    for nx, ny in cases:
        for halo in halos:
            (xl, xh), (yl, yh) = pic.normalize_halo(halo)
            xr = jnp.asarray(rng.uniform(-xl, xh - 1e-3, (nx, ny)), jnp.float32)
            yr = jnp.asarray(rng.uniform(-yl, yh - 1e-3, (nx, ny)), jnp.float32)
            ch = tuple(jnp.asarray(rng.uniform(0, 1, (nx, ny)), jnp.float32)
                       for _ in range(3))
            act = jnp.asarray(rng.uniform(0, 1, (nx, ny)) > 0.2)
            for bx, by in [(Boundary.PERIODIC, Boundary.PERIODIC),
                           (Boundary.NONPERIODIC, Boundary.NONPERIODIC),
                           (Boundary.PERIODIC, Boundary.TRIPOLAR_NORTH)]:
                st = GridStats(nx=nx, ny=ny, bx=bx, by=by)
                A, sa = jax.jit(lambda *a: pic.scatter_channels(
                    *a, st, halo, "dense"))(xr, yr, ch, act)
                B, sb = jax.jit(lambda *a: pic.scatter_channels(
                    *a, st, halo, "dense_pallas"))(xr, yr, ch, act)
                for i in range(3):
                    check(f"{nx}x{ny} halo={halo} {bx.name}/{by.name} ch{i}",
                          A[i], B[i], rtol=2e-6)
                assert int(sa.clamped) == int(sb.clamped)


def _models(nx, ny, **kw):
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True, solver="bosh3")
    grid = cartesian_box(2e3 * (nx - 1), nx, 2e3 * (ny - 1), ny,
                         periodic_boundary=(True, True))
    mk = lambda **c: WaveGrowth2D(grid, constant_winds(10.0, 7.0), sett,
                                  config=WaveGrowth2DConfig(
                                      periodic_boundary=True, **c))
    return mk(**kw)


def check_step_paths():
    print("[2/6] full step: pallas config vs XLA config (5 steps)")
    for nx, ny in [(64, 48), (127, 61)]:
        mx = _models(nx, ny, advance_mode="xla", scatter_mode="dense",
                     dt_reset_mode="carry")
        mp = _models(nx, ny, advance_mode="pallas",
                     scatter_mode="dense_pallas", dt_reset_mode="carry")
        step5 = lambda m: jax.jit(lambda s: jax.lax.fori_loop(
            0, 5, lambda _, c: m.step(c), s))(m.init_state())
        sx, sp = step5(mx), step5(mp)
        check(f"{nx}x{ny} state after 5 steps", sp.state, sx.state,
              rtol=2e-4, atol=1e-6)


def check_remesh_pallas():
    print("[3/6] pallas remesh vs XLA remesh (5 steps)")
    mx = _models(64, 48, advance_mode="pallas", scatter_mode="dense_pallas",
                 dt_reset_mode="carry", remesh_mode="xla")
    mp = _models(64, 48, advance_mode="pallas", scatter_mode="dense_pallas",
                 dt_reset_mode="carry", remesh_mode="pallas")
    step5 = lambda m: jax.jit(lambda s: jax.lax.fori_loop(
        0, 5, lambda _, c: m.step(c), s))(m.init_state())
    check("remesh backends", step5(mp).state, step5(mx).state,
          rtol=1e-5, atol=1e-7)


def check_gridded_winds_pwl():
    print("[5/6] gridded winds via exact PWL fields (frame-straddling)")
    import numpy as np

    from picles_tpu.forcing.winds import GriddedWinds2D

    nxw = nyw = 10
    rng = np.random.default_rng(7)
    base = rng.uniform(6.0, 14.0, (30, 1, 1))
    u = (base + rng.standard_normal((30, nxw, nyw))).astype(np.float32)
    v = (0.5 * base + rng.standard_normal((30, nxw, nyw))).astype(np.float32)
    # 900 s cadence vs DT=600 s: every other window straddles a frame
    gw = GriddedWinds2D(u_data=jnp.asarray(u), v_data=jnp.asarray(v),
                        x0=0.0, dx=2e3 * 63 / (nxw - 1), y0=0.0,
                        dy=2e3 * 47 / (nyw - 1), t0=0.0, dt=900.0)

    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True, solver="bosh3")
    grid = cartesian_box(2e3 * 63, 64, 2e3 * 47, 48,
                         periodic_boundary=(True, True))
    mk = lambda **c: WaveGrowth2D(grid, gw.as_winds(), sett,
                                  config=WaveGrowth2DConfig(
                                      periodic_boundary=True, **c))
    mx = mk(advance_mode="xla", scatter_mode="dense", dt_reset_mode="carry")
    mp = mk(advance_mode="pallas", scatter_mode="dense_pallas",
            dt_reset_mode="carry")
    assert mp._wind_B == 1
    step4 = lambda m: jax.jit(lambda s: jax.lax.fori_loop(
        0, 4, lambda _, c: m.step(c), s))(m.init_state())
    sx, sp = step4(mx), step4(mp)
    # rtol matches the CPU twin (test_pallas_advance_gridded_winds_frame_
    # straddle): spatially-varying winds make more lanes sit near
    # accept/reject boundaries, so 4 adaptive steps across backends carry
    # controller noise (~3e-3 max observed).  The PWL fields' exactness
    # itself is pinned at 1e-5 by the dense-query field tests; this check
    # is the Mosaic-lowering sanity for the breakpoint sampler.
    check("gridded PWL winds 64x48 (4 steps, straddling)", sp.state,
          sx.state, rtol=1e-2, atol=1e-6)


def check_fused_scatter_remesh():
    print("[4/6] fused gather+remesh kernel vs split phases (5 steps)")
    for nx, ny in [(64, 48), (127, 61)]:
        mx = _models(nx, ny, advance_mode="pallas",
                     scatter_mode="dense_pallas", dt_reset_mode="carry",
                     remesh_mode="xla")
        mf = _models(nx, ny, advance_mode="pallas",
                     scatter_mode="dense_pallas", dt_reset_mode="carry",
                     remesh_mode="fused")
        step5 = lambda m: jax.jit(lambda s: jax.lax.fori_loop(
            0, 5, lambda _, c: m.step(c), s))(m.init_state())
        sx, sf = step5(mx), step5(mf)
        check(f"fused scatter+remesh {nx}x{ny}", sf.state, sx.state,
              rtol=1e-5, atol=1e-7)
        for k in ("n_gather", "n_reseed", "n_off"):
            assert int(getattr(sf.metrics, k)) == \
                int(getattr(sx.metrics, k)), (nx, ny, k)


def check_layered_vmap():
    print("[6/6] layered (vmapped) step through the Mosaic kernels")
    mx = _models(64, 48, advance_mode="xla", dt_reset_mode="carry",
                 layers=3)
    mp = _models(64, 48, advance_mode="pallas",
                 scatter_mode="dense_pallas", dt_reset_mode="carry",
                 layers=3)
    ms = mx.init_state_layers()
    sx = jax.jit(mx.step_layers)(ms)
    sp = jax.jit(mp.step_layers)(ms)
    check("layered vmap 3x64x48", sp.state, sx.state, rtol=2e-4, atol=1e-7)


def main():
    print(f"devices: {jax.devices()}")
    check_scatter()
    check_step_paths()
    check_remesh_pallas()
    check_fused_scatter_remesh()
    check_gridded_winds_pwl()
    check_layered_vmap()
    print(f"ALL OK ({PASS} checks)")


if __name__ == "__main__":
    main()
