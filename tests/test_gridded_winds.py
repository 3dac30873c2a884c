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
