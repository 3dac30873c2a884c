"""Gridded (stored) wind forcing — the netCDF-forced path (reference
T04_2D_reg_test_netCDF.jl / B02_2D_regtest_netCDF.jl analogs, with the wind
field supplied as arrays instead of a NetCDF file; the loader is the same
interpolation machinery)."""

import numpy as np
import jax
import jax.numpy as jnp

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import GriddedWinds2D, Winds2D
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig


def _gridded_blob_winds():
    """A moving wind blob stored on a coarse (t, x, y) grid."""
    nt, nx, ny = 8, 11, 11
    t = np.linspace(0, 4 * 3600.0, nt)
    x = np.linspace(0, 100e3, nx)
    y = np.linspace(0, 100e3, ny)
    T, X, Y = np.meshgrid(t, x, y, indexing="ij")
    x0 = 20e3 + 8.0 * T  # blob moving in +x
    u = 12.0 * np.exp(-(((X - x0) / 25e3) ** 2 + ((Y - 50e3) / 30e3) ** 2))
    v = np.zeros_like(u)
    return GriddedWinds2D(u_data=jnp.asarray(u, jnp.float32),
                          v_data=jnp.asarray(v, jnp.float32),
                          x0=0.0, dx=float(x[1] - x[0]),
                          y0=0.0, dy=float(y[1] - y[0]),
                          t0=0.0, dt=float(t[1] - t[0]))


def test_gridded_interpolation_values():
    gw = _gridded_blob_winds()
    # at a grid node the interpolant returns the stored value
    u = float(gw.u(20e3, 50e3, 0.0))
    assert np.isclose(u, 12.0, rtol=1e-5)
    # halfway between nodes: between neighbors
    u_mid = float(gw.u(24.5e3, 50e3, 0.0))
    assert 0 < u_mid < 12.0


def test_model_with_gridded_winds():
    gw = _gridded_blob_winds()
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, 21, 100e3, 21, periodic_boundary=(False, False))
    model = WaveGrowth2D(grid, gw.as_winds(), sett,
                         config=WaveGrowth2DConfig(periodic_boundary=False))
    ms = model.init_state()
    # seeded on only where the blob blows hard enough
    on0 = np.asarray(ms.particles.on)
    assert on0.sum() > 0
    assert not on0.all()
    step = jax.jit(model.step)
    for _ in range(8):
        ms = step(ms)
    e = np.asarray(ms.state[..., 0])
    assert np.all(np.isfinite(e))
    assert int(ms.metrics.n_failed) == 0
    # waves exist downwind of the blob track (center row)
    assert e[8:16, 8:13].max() > 0


def test_per_axis_edge_modes_short_wind_record():
    """A wind record SHORTER than the run: the time axis clamps (holds the
    last frame) independently of the spatial mode — previously choosing
    'wrap' for periodic space also wrapped time (VERDICT r2 item 9)."""
    nt, nxw, nyw = 4, 6, 6
    rng = np.random.default_rng(7)
    u = rng.uniform(6.0, 12.0, (nt, nxw, nyw)).astype(np.float32)
    v = rng.uniform(-3.0, 3.0, (nt, nxw, nyw)).astype(np.float32)
    kw = dict(x0=0.0, dx=20e3, y0=0.0, dy=20e3, t0=0.0, dt=600.0)

    gw = GriddedWinds2D(u_data=jnp.asarray(u), v_data=jnp.asarray(v),
                        mode="wrap", mode_t="clamp", **kw)
    # beyond the record end (t > 3*600) the last frame holds
    for t_late in (1800.0, 3600.0, 7200.0):
        np.testing.assert_allclose(
            np.asarray(gw.u(jnp.asarray([0.0, 40e3]), jnp.asarray([20e3] * 2),
                            jnp.full(2, t_late))),
            u[-1, [0, 2], 1], rtol=1e-6)
    # while space wraps periodically: x = nxw*dx == x = 0
    np.testing.assert_allclose(float(gw.u(nxw * 20e3, 0.0, 0.0)),
                               u[0, 0, 0], rtol=1e-6)
    # time wrap mode loops the record instead
    gw_wrap = GriddedWinds2D(u_data=jnp.asarray(u), v_data=jnp.asarray(v),
                             mode="wrap", mode_t="wrap", **kw)
    np.testing.assert_allclose(float(gw_wrap.u(0.0, 0.0, nt * 600.0)),
                               u[0, 0, 0], rtol=1e-6)


def test_model_run_past_wind_record_end():
    """Model integration continuing past the wind record: identical to a
    run on a record extended by repeating the final frame."""
    DT = 600.0
    nt, nxw, nyw = 3, 6, 6
    rng = np.random.default_rng(11)
    u = rng.uniform(8.0, 12.0, (nt, nxw, nyw)).astype(np.float32)
    v = rng.uniform(2.0, 4.0, (nt, nxw, nyw)).astype(np.float32)
    kw = dict(x0=0.0, dx=100e3 / (nxw - 1), y0=0.0, dy=100e3 / (nyw - 1),
              t0=0.0, dt=2 * DT)
    short = GriddedWinds2D(u_data=jnp.asarray(u), v_data=jnp.asarray(v),
                           **kw)
    u_ext = np.concatenate([u, np.repeat(u[-1:], 6, axis=0)])
    v_ext = np.concatenate([v, np.repeat(v[-1:], 6, axis=0)])
    extended = GriddedWinds2D(u_data=jnp.asarray(u_ext),
                              v_data=jnp.asarray(v_ext), **kw)

    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, 12, 100e3, 12,
                         periodic_boundary=(True, True))

    def run(gw):
        m = WaveGrowth2D(grid, gw, sett,
                         config=WaveGrowth2DConfig(periodic_boundary=True))
        ms = m.init_state()
        step = jax.jit(m.step)
        for _ in range(8):  # record covers 4 steps; 4 more past the end
            ms = step(ms)
        return np.asarray(ms.state)

    # f32 frac rounding at the clamp boundary (frac ~1e-7 against the
    # wrap neighbor) is amplified by the adaptive solver to ~1e-4; a
    # wrong-frame bug would be ~10%
    np.testing.assert_allclose(run(short), run(extended), rtol=1e-3)
