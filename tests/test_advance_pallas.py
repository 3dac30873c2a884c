"""Pallas fused-advance kernel vs the XLA while_loop path (interpret mode on
CPU; on TPU the same code compiles via Mosaic — cross-checked by bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds, time_cosine_winds
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig


def _models(winds, n=24):
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, n, 100e3, n, periodic_boundary=(True, True))
    mx = WaveGrowth2D(grid, winds, sett,
                      config=WaveGrowth2DConfig(periodic_boundary=True,
                                                advance_mode="xla"))
    mp = WaveGrowth2D(grid, winds, sett,
                      config=WaveGrowth2DConfig(periodic_boundary=True,
                                                advance_mode="pallas",
                                                pallas_interpret=True))
    return mx, mp


def test_pallas_advance_matches_xla_constant_winds():
    mx, mp = _models(constant_winds(10.0, 5.0))
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(3):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=5e-3, atol=1e-8)
    assert int(sp.metrics.n_failed) == 0
    # same branch counts: the state machine is identical
    assert int(sp.metrics.n_gather) == int(sx.metrics.n_gather)
    assert int(sp.metrics.n_active) == int(sx.metrics.n_active)


def test_pallas_advance_time_dependent_winds():
    """Per-lane time enters the wind closure inside the kernel."""
    winds = time_cosine_winds(10.0, 0.0, period=6 * 3600.0)
    mx, mp = _models(winds, n=12)
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(4):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=1e-2, atol=1e-7)


def test_pallas_block_divisor_handling():
    """Odd grid sizes still work (8-aligned blocks + row padding)."""
    mx, mp = _models(constant_winds(10.0, 5.0), n=23)
    sp = mp.init_state()
    sp = mp.step(sp)
    assert np.all(np.isfinite(np.asarray(sp.state)))


@pytest.mark.parametrize("n", [
    61,
    # second prime size: exhaustive tier (same padding machinery)
    pytest.param(127, marks=pytest.mark.slow),
])
def test_pallas_prime_nx_all_kernels_match_xla(n):
    """Prime nx: the old divisor search degenerated to 1-row blocks (a
    Mosaic hazard / silent perf cliff); blocks are now 8-aligned with row
    padding and must give identical results.  Runs the full production
    stack (fused advance + deposit + remesh, small forced block_x so the
    padding path is exercised with several tiles)."""
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, n, 50e3, 13, periodic_boundary=(True, True))
    winds = constant_winds(10.0, 5.0)
    mx = WaveGrowth2D(grid, winds, sett,
                      config=WaveGrowth2DConfig(periodic_boundary=True,
                                                dt_reset_mode="carry"))
    mp = WaveGrowth2D(grid, winds, sett,
                      config=WaveGrowth2DConfig(
                          periodic_boundary=True, advance_mode="pallas",
                          scatter_mode="dense_pallas", remesh_mode="pallas",
                          dt_reset_mode="carry", pallas_block_x=16,
                          pallas_interpret=True))
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(2):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=5e-3, atol=1e-8)
    assert int(sp.metrics.n_failed) == 0
    for k in ("n_gather", "n_reseed", "n_off", "n_active"):
        assert int(getattr(sp.metrics, k)) == int(getattr(sx.metrics, k)), k


@pytest.mark.slow
@pytest.mark.parametrize("n", [61])
def test_auto_dt_pallas_prime_nx(n):
    """[exhaustive tier: auto-dt is a non-production dt policy and the
    prime-nx padding machinery is locked by
    test_pallas_prime_nx_all_kernels_match_xla; the auto_dt kernel itself
    by test_auto_dt_pallas_matches_xla]

    auto_dt path (dt_reset_mode='auto') on a prime nx."""
    mx, mp = _models(constant_winds(10.0, 5.0), n=n)
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(2):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.particles.dt),
                               np.asarray(sx.particles.dt), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=5e-3, atol=1e-8)


@pytest.mark.slow
def test_pallas_advance_gridded_winds():
    """[exhaustive tier: the frame-straddle variant below is the
    stronger default-tier lock for the same path]

    Gridded (map_coordinates) winds run on the Pallas path via the
    per-step linearization fields.  Forcing cadence = 2 DT and aligned, so
    the linearization equals the tri-linear interpolant exactly and the two
    paths must agree to solver tolerance."""
    from picles_tpu.forcing.winds import GriddedWinds2D

    DT = 600.0
    nxw, nyw, ntw = 12, 12, 40
    rng = np.random.default_rng(0)
    u_data = 8.0 + 3.0 * rng.standard_normal((ntw, nxw, nyw)).astype(np.float32)
    v_data = 5.0 + 2.0 * rng.standard_normal((ntw, nxw, nyw)).astype(np.float32)
    gw = GriddedWinds2D(u_data=jnp.asarray(u_data), v_data=jnp.asarray(v_data),
                        x0=0.0, dx=100e3 / (nxw - 1), y0=0.0,
                        dy=100e3 / (nyw - 1), t0=0.0, dt=2 * DT)
    mx, mp = _models(gw.as_winds(), n=16)
    assert mp.gridded_winds is gw  # bound-method detection
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(4):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=1e-2, atol=1e-7)
    assert int(sp.metrics.n_failed) == 0
    assert int(sp.metrics.n_gather) == int(sx.metrics.n_gather)


@pytest.mark.parametrize("t0,dtw,DT", [
    (1200.0, 1200.0, 600.0),   # aligned: window inside one frame interval
    (900.0, 1200.0, 600.0),    # straddles one frame boundary (t=1200)
    (700.0, 1200.0, 600.0),    # straddle at an uneven offset
    (500.0, 400.0, 600.0),     # DT > frame cadence: B=2, two breakpoints
    (10300.0, 1200.0, 600.0),  # straddles the record end (time clamp)
])
def test_gridded_pwl_fields_match_interpolant_everywhere(t0, dtw, DT):
    """pallas_pwl_fields reproduces the tri-linear interpolant EXACTLY at
    dense query times through the window — including windows that straddle
    wind-data frame boundaries (the case the old secant linearization
    approximated) and the record-end time clamp."""
    from picles_tpu.forcing.winds import (GriddedWinds2D,
                                          gridded_pallas_samplers)

    rng = np.random.default_rng(1)
    gw = GriddedWinds2D(
        u_data=jnp.asarray(rng.standard_normal((10, 8, 8)).astype(np.float32)),
        v_data=jnp.asarray(rng.standard_normal((10, 8, 8)).astype(np.float32)),
        x0=0.0, dx=10e3, y0=0.0, dy=10e3, t0=0.0, dt=dtw)
    x = jnp.asarray(np.linspace(0, 70e3, 8, dtype=np.float32))
    xx, yy = jnp.meshgrid(x, x, indexing="ij")
    B = gw.n_breakpoints(DT)
    fields = gw.pallas_pwl_fields(xx, yy, t0, DT)
    assert len(fields) == 4 + 3 * B
    u_k, v_k = gridded_pallas_samplers(B)
    for frac in np.linspace(0.0, 1.0, 13):
        tq = t0 + frac * DT
        tqb = jnp.full_like(xx, tq)
        np.testing.assert_allclose(np.asarray(u_k(xx, yy, tqb, *fields)),
                                   np.asarray(gw.u(xx, yy, tqb)),
                                   rtol=1e-5, atol=1e-5, err_msg=f"u t={tq}")
        np.testing.assert_allclose(np.asarray(v_k(xx, yy, tqb, *fields)),
                                   np.asarray(gw.v(xx, yy, tqb)),
                                   rtol=1e-5, atol=1e-5, err_msg=f"v t={tq}")


def test_pallas_advance_gridded_winds_frame_straddle():
    """Model-level lock for the straddle case: wind frames at a cadence
    that is NOT a multiple of DT (900 s vs DT = 600 s), so every other DT
    window crosses a frame boundary mid-advance.  With the exact PWL
    fields the Pallas path must match the XLA path (which samples the
    interpolant directly at every RHS eval) at solver tolerance — there is
    no longer a silent secant approximation on the production path."""
    from picles_tpu.forcing.winds import GriddedWinds2D

    nxw = nyw = 10
    ntw = 30
    rng = np.random.default_rng(7)
    # smooth-ish in space, sharply varying between frames so a secant
    # across a frame boundary would be visibly wrong
    base = rng.uniform(6.0, 14.0, (ntw, 1, 1))
    u_data = (base + rng.standard_normal((ntw, nxw, nyw))).astype(np.float32)
    v_data = (0.5 * base
              + rng.standard_normal((ntw, nxw, nyw))).astype(np.float32)
    gw = GriddedWinds2D(u_data=jnp.asarray(u_data), v_data=jnp.asarray(v_data),
                        x0=0.0, dx=100e3 / (nxw - 1), y0=0.0,
                        dy=100e3 / (nyw - 1), t0=0.0, dt=900.0)
    mx, mp = _models(gw.as_winds(), n=12)
    assert mp._wind_B == 1
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(4):   # windows [0,600], [600,1200]*, [1200,1800]*, ...
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=1e-2, atol=1e-7)
    assert int(sp.metrics.n_failed) == 0
    assert int(sp.metrics.n_gather) == int(sx.metrics.n_gather)


def test_auto_dt_pallas_matches_xla():
    """Fused auto_dt kernel vs tsit5.auto_dt on the same particle state."""
    from picles_tpu.ops.advance_pallas import auto_dt_pallas
    from picles_tpu.ops.rhs import RHSParams, make_rhs_consts
    from picles_tpu.ops.tsit5 import auto_dt

    mx, _ = _models(constant_winds(10.0, 5.0), n=24)
    ms = mx.init_state()
    for _ in range(2):
        ms = mx.step(ms)
    g = mx.grid
    aux = RHSParams(x=g.x, y=g.y, M=g.proj, pc=g.pc)
    d_xla = auto_dt(mx.rhs, ms.particles.t, ms.particles.z, aux,
                    abstol=mx.settings.abstol, reltol=mx.settings.reltol)
    consts = make_rhs_consts(gamma=mx.constants.gamma,
                             constants=mx.constants, params=mx.params)
    d_pl = auto_dt_pallas(mx.winds.u, mx.winds.v, consts, mx.flags,
                          ms.particles.t, ms.particles.z, g.x, g.y,
                          g.proj, g.pc, abstol=mx.settings.abstol,
                          reltol=mx.settings.reltol, interpret=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_xla),
                               rtol=1e-4, atol=1e-8)


def test_pallas_advance_per_node_projection_spherical():
    """Spherical grids have per-node projection matrices and great-circle
    coefficients — the fused kernel's streamed (non-uniform) proj/pc branch.
    Propagation-only blob: pallas vs xla must agree on a sphere."""
    import dataclasses
    import math

    from picles_tpu.grids.spherical import spherical_grid_2d
    from picles_tpu.ops.rhs import TermFlags

    DT = 1800.0
    ws = FR.MinimalWindsea(1.0, 1.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=10 * 24 * 3600.0, dt=1.0,
                       dtmin=1e-2, force_dtmin=True)
    grid = spherical_grid_2d(0.0, 60.0, 16, 10.0, 50.0, 12,
                             periodic_boundary=(True, False))
    flags = TermFlags(input=False, dissipation=False, peak_shift=False,
                      direction=False)

    def mk(mode):
        return WaveGrowth2D(
            grid, constant_winds(0.0, 0.0), sett, flags=flags,
            config=WaveGrowth2DConfig(periodic_boundary=False, halo=4,
                                      advance_mode=mode,
                                      pallas_interpret=True))

    mx, mp = mk("xla"), mk("pallas")
    assert mp.uniform_proj is None  # must exercise the streamed-proj branch

    def plant(ms):
        nx, ny = grid.nx, grid.ny
        on = np.zeros((nx, ny), bool)
        on[5:9, 4:8] = True
        z = np.asarray(ms.particles.z).copy()
        z[..., 0] = math.log(0.1)
        z[..., 1] = 10.0
        z[..., 2] = 0.0
        z[..., 3:] = 0.0
        import jax.numpy as jnp
        from picles_tpu.models.state import Particles2D
        return dataclasses.replace(
            ms, particles=Particles2D.from_z(jnp.asarray(z, jnp.float32),
                                             ms.particles.t, ms.particles.dt,
                                             jnp.asarray(on)))

    sx, sp = plant(mx.init_state()), plant(mp.init_state())
    for _ in range(3):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=5e-3, atol=1e-8)
    assert int(sp.metrics.n_failed) == 0
    # the great-circle term must actually act (equatorward momentum appears)
    assert np.asarray(sp.state[..., 2]).min() < -1e-6


# ---------------------------------------------------------------------------
# fused remesh kernel (ops/remesh_pallas.py)
# ---------------------------------------------------------------------------

def _carry_models(winds, n=24, remesh="pallas"):
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, n, 100e3, n, periodic_boundary=(True, True))
    # the "fused" remesh runs inside the gather-kernel deposit; give the
    # XLA-remesh baseline the SAME deposit backend so the comparison
    # isolates the remesh fusion (deposit backends differ in summation
    # order, which wave growth amplifies past tight tolerances)
    scatter = "dense_pallas" if remesh == "fused" else "auto"
    mk = lambda rm: WaveGrowth2D(  # noqa: E731
        grid, winds, sett,
        config=WaveGrowth2DConfig(periodic_boundary=True,
                                  advance_mode="pallas",
                                  scatter_mode=scatter,
                                  dt_reset_mode="carry",
                                  remesh_mode=rm,
                                  pallas_interpret=True))
    return mk("xla"), mk(remesh)


@pytest.mark.parametrize("remesh", [
    "pallas",
    # fused remesh-in-gather: exhaustive tier (same branch table is
    # locked by the [pallas] sibling + test_fused_remesh_boundary_families)
    pytest.param("fused", marks=pytest.mark.slow),
])
def test_remesh_pallas_matches_xla_constant_winds(remesh):
    mx, mp = _carry_models(constant_winds(10.0, 5.0), remesh=remesh)
    sx, sp = mx.init_state(), mp.init_state()
    sx, sp = mx.step(sx), mp.step(sp)
    # after ONE step the carried dt must agree tightly — this pins the dt
    # plumbing (a misrouted plane shows up instantly as clip(junk))
    np.testing.assert_allclose(np.asarray(sp.particles.dt),
                               np.asarray(sx.particles.dt), rtol=1e-6)
    for _ in range(2):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=1e-5, atol=1e-9)
    # after 3 steps dt is error-controller state: a 1-ulp cross-backend
    # difference in the gathered cg can flip one accept/reject decision
    # and legitimately move a lane's carried dt (observed: 600 vs
    # 600*0.953 after a rejected probe; on a homogeneous box ALL lanes
    # flip together).  Bound by the single-flip controller envelope.
    np.testing.assert_allclose(np.asarray(sp.particles.dt),
                               np.asarray(sx.particles.dt), rtol=0.11)
    for f in ("n_gather", "n_reseed", "n_off", "n_active", "n_failed"):
        assert int(getattr(sp.metrics, f)) == int(getattr(sx.metrics, f)), f


@pytest.mark.parametrize("remesh", [
    "pallas",
    # fused remesh-in-gather: exhaustive tier (same branch table is
    # locked by the [pallas] sibling + test_fused_remesh_boundary_families)
    pytest.param("fused", marks=pytest.mark.slow),
])
def test_remesh_pallas_reseed_and_off_branches(remesh):
    """Half-domain winds drive the off (and possibly reseed) branches
    through the fused kernel identically to the XLA selects."""
    from picles_tpu.forcing.winds import half_domain_winds

    winds = half_domain_winds(10.0, 5.0, x_split=50e3)
    # n/steps sized for interpret-mode cost: the off branch fires from
    # step 1 on the calm half (asserted below via the off population —
    # n_off counts on->off TRANSITIONS, of which a steady half-calm box
    # has none), so 5 steps at 12^2 keep the coverage of the old 8 steps
    # at 16^2 at ~1/3 the wall time
    mx, mp = _carry_models(winds, n=12, remesh=remesh)
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(5):
        sx = mx.step(sx)
        sp = mp.step(sp)
        assert int(sp.metrics.n_off) == int(sx.metrics.n_off)
        assert int(sp.metrics.n_reseed) == int(sx.metrics.n_reseed)
        # the go_off branch executed and holds the calm half off,
        # identically across backends
        assert int((~np.asarray(sp.particles.on)).sum()) > 0
        assert np.array_equal(np.asarray(sp.particles.on),
                              np.asarray(sx.particles.on))
        # backends agree to ~1 ulp/step; growth amplifies rounding order
        np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                                   rtol=1e-2, atol=1e-8)


@pytest.mark.parametrize("remesh", [
    "pallas",
    # fused remesh-in-gather: exhaustive tier (same branch table is
    # locked by the [pallas] sibling + test_fused_remesh_boundary_families)
    pytest.param("fused", marks=pytest.mark.slow),
])
def test_remesh_pallas_gridded_winds(remesh):
    import math

    from picles_tpu.forcing.winds import GriddedWinds2D

    nt, ngx, ngy = 8, 12, 12
    tg = np.linspace(0, 8 * 3600.0, nt)
    xg = np.linspace(0, 100e3, ngx)
    u = np.zeros((nt, ngx, ngy), np.float32)
    for k in range(nt):
        u[k] = 8.0 + 4.0 * math.sin(2 * math.pi * k / nt)
    gw = GriddedWinds2D(u_data=jnp.asarray(u), v_data=jnp.asarray(0.3 * u),
                        x0=0.0, dx=float(xg[1] - xg[0]),
                        y0=0.0, dy=float(xg[1] - xg[0]),
                        t0=0.0, dt=float(tg[1] - tg[0]))
    mx, mp = _carry_models(gw, n=12, remesh=remesh)
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(4):
        sx = mx.step(sx)
        sp = mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=1e-4, atol=1e-8)


def test_remesh_pallas_requires_carry():
    import pytest

    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, 8, 100e3, 8, periodic_boundary=(True, True))
    m = WaveGrowth2D(grid, constant_winds(10.0, 5.0), sett,
                     config=WaveGrowth2DConfig(remesh_mode="pallas",
                                               dt_reset_mode="auto",
                                               pallas_interpret=True))
    with pytest.raises(ValueError):
        m.step(m.init_state())


def test_auto_block_x_respects_scoped_vmem_limit():
    """The VMEM-budget block sizing must keep the Mosaic stack under the
    16 MB scoped limit for any ny, including lane-padded awkward sizes.

    Regression: at 360x180 (1-deg tripolar grid) the naive
    ``budget // (ny * n * 4)`` sizing picked a 256-row block whose
    compile-time stack request was 24.28 MB (93 f32 buffers after lane
    padding 180 -> 256), an AOT OOM on the real chip.
    """
    from picles_tpu.ops.pallas_util import auto_block_x, row_block

    LIMIT = 16 * 1024 * 1024
    for ny in (24, 51, 127, 180, 256, 768, 1536, 3072):
        for n_buf in (64, 93):
            bx, _ = row_block(10_000, auto_block_x(ny, n_buf))
            ny_lanes = ((ny + 127) // 128) * 128
            stack = bx * ny_lanes * 4 * n_buf
            assert stack <= LIMIT, (ny, n_buf, bx, stack)
            assert bx % 8 == 0
    # the production 1536^2 bench config keeps its proven 24-row block
    assert row_block(1536, auto_block_x(1536, 93))[0] == 24


def test_pallas_advance_wide_grid_column_tiling():
    """Grids too wide for even an 8-row full-width block (ny >= ~5300 at
    the advance kernel's 93-buffer stack) switch to 2D column tiling
    instead of raising — the 2D-tiled kernel must match the XLA
    integrator exactly like the 1D one."""
    from picles_tpu.ops.pallas_util import col_block

    ny = 6016
    assert col_block(ny, 93) < ((ny + 127) // 128) * 128  # 2D path engaged
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(30e3, 16, 2e3 * (ny - 1), ny,
                         periodic_boundary=(True, True))
    mx = WaveGrowth2D(grid, constant_winds(10.0, 5.0), sett,
                      config=WaveGrowth2DConfig(periodic_boundary=True,
                                                advance_mode="xla"))
    mp = WaveGrowth2D(grid, constant_winds(10.0, 5.0), sett,
                      config=WaveGrowth2DConfig(periodic_boundary=True,
                                                advance_mode="pallas",
                                                pallas_interpret=True))
    sx, sp = mx.init_state(), mp.init_state()
    sx, sp = mx.step(sx), mp.step(sp)
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=5e-3, atol=1e-8)
    assert int(sp.metrics.n_failed) == 0
    assert int(sp.metrics.n_gather) == int(sx.metrics.n_gather)


@pytest.mark.parametrize("boundary,halo", [
    # tripolar variant: exhaustive tier (the seam fold itself is locked by
    # test_pic_pallas / test_tripolar; this sweep re-runs it through the
    # fused remesh, whose branch table the nonperiodic case also covers)
    pytest.param("tripolar", ((0, 3), (0, 3)), marks=pytest.mark.slow),
    ("nonperiodic", ((1, 3), (0, 2))),
])
def test_fused_remesh_boundary_families(boundary, halo):
    """remesh_mode='fused' across the boundary families the production
    configs use: tripolar seam with zero-lo halo and non-periodic with
    asymmetric bounds.  Compared against remesh_mode='xla' on the SAME
    (dense_pallas) deposit, the composition is bitwise identical in
    interpret mode."""
    import dataclasses

    from picles_tpu.grids.base import Boundary

    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    per = boundary != "nonperiodic"
    grid = cartesian_box(100e3, 24, 100e3, 16,
                         periodic_boundary=(per, per))
    if boundary == "tripolar":
        stats = dataclasses.replace(grid.stats, bx=Boundary.PERIODIC,
                                    by=Boundary.TRIPOLAR_NORTH)
        grid = dataclasses.replace(grid, stats=stats)
    mk = lambda rm: WaveGrowth2D(  # noqa: E731
        grid, constant_winds(0.0, 10.0), sett,
        config=WaveGrowth2DConfig(periodic_boundary=per,
                                  advance_mode="pallas",
                                  scatter_mode="dense_pallas",
                                  dt_reset_mode="carry", remesh_mode=rm,
                                  halo=halo, pallas_interpret=True))
    mx, mf = mk("xla"), mk("fused")
    sx, sf = mx.init_state(), mf.init_state()
    for _ in range(3):
        sx = mx.step(sx)
        sf = mf.step(sf)
    np.testing.assert_array_equal(np.asarray(sf.state), np.asarray(sx.state))
    for k in ("n_gather", "n_reseed", "n_off", "n_failed"):
        assert int(getattr(sf.metrics, k)) == int(getattr(sx.metrics, k)), k


def test_fused_requires_dense_pallas_scatter():
    """remesh_mode='fused' IS the dense_pallas deposit: any other resolved
    scatter_mode is a config error, raised clearly instead of dying in
    Mosaic lowering."""
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, 8, 100e3, 8, periodic_boundary=(True, True))
    m = WaveGrowth2D(grid, constant_winds(10.0, 5.0), sett,
                     config=WaveGrowth2DConfig(remesh_mode="fused",
                                               scatter_mode="dense",
                                               dt_reset_mode="carry",
                                               pallas_interpret=True))
    with pytest.raises(ValueError, match="dense_pallas"):
        m.step(m.init_state())


@pytest.mark.parametrize("remesh", ["pallas", "fused"])
def test_remesh_pallas_fixed_substep_carries_dt_unclipped(remesh):
    """ODESettings.adaptive=False: the Pallas/fused remesh must carry dt
    untouched like the XLA tail's `if not sett.adaptive: pass` — a
    fixed sub-step configured outside [dtmin, DT] (here 2*DT) previously
    came back clipped to DT from the fused kernels only, breaking the
    identical-backends contract on the dt plane."""
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0,
                       dt=2 * DT,              # deliberate: outside [dtmin, DT]
                       dtmin=1e-4, force_dtmin=True, adaptive=False)
    grid = cartesian_box(100e3, 8, 100e3, 8, periodic_boundary=(True, True))
    scatter = "dense_pallas" if remesh == "fused" else "auto"
    mk = lambda rm: WaveGrowth2D(  # noqa: E731
        grid, constant_winds(10.0, 5.0), sett,
        config=WaveGrowth2DConfig(periodic_boundary=True,
                                  advance_mode="pallas",
                                  scatter_mode=scatter,
                                  dt_reset_mode="carry",
                                  remesh_mode=rm,
                                  pallas_interpret=True))
    mx, mp = mk("xla"), mk(remesh)
    sx, sp = mx.init_state(), mp.init_state()
    for _ in range(2):
        sx, sp = mx.step(sx), mp.step(sp)
    # both backends carry the configured fixed sub-step verbatim
    np.testing.assert_array_equal(np.asarray(sp.particles.dt),
                                  np.full((8, 8), 2 * DT, np.float32))
    np.testing.assert_array_equal(np.asarray(sx.particles.dt),
                                  np.asarray(sp.particles.dt))
    np.testing.assert_allclose(np.asarray(sp.state), np.asarray(sx.state),
                               rtol=2e-6, atol=1e-9)


def test_auto_dt_falls_back_to_xla_on_ultra_wide_grid():
    """ny too wide even for the auto-dt kernel's 8-row block (> 8192
    lanes at its 64-buffer stack): the DEFAULT config (dt_reset "auto")
    must fall back to the XLA Hairer estimate instead of raising from
    auto_block_x — the advance kernel itself column-tiles fine."""
    from picles_tpu.ops.pallas_util import fits_row_tiling

    ny = 8320
    assert not fits_row_tiling(ny, 64)       # auto-dt kernel cannot tile
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(14e3, 8, 2e3 * (ny - 1), ny,
                         periodic_boundary=(True, True))
    m = WaveGrowth2D(grid, constant_winds(10.0, 5.0), sett,
                     config=WaveGrowth2DConfig(periodic_boundary=True,
                                               advance_mode="pallas",
                                               dt_reset_mode="auto",
                                               pallas_interpret=True))
    ms = m.init_state()
    ms = m.step(ms)                          # raised ValueError before
    assert int(ms.metrics.n_failed) == 0
    assert np.all(np.isfinite(np.asarray(ms.state)))
