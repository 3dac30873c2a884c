"""Growing/decaying winds with particle on/off reseeding — the
T04_2D_growing_decaying_winds / T04_2D_on_off_particle_tests analog
(reference tests/T04_2D_growing_decaying_winds.jl:36-45)."""

import numpy as np
import jax
import jax.numpy as jnp

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import Winds2D
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig


def _pulse_winds(U=12.0, t_on=0.0, t_off=2 * 3600.0):
    """Wind blows from t_on to t_off, then calm."""
    def u(x, y, t):
        t = jnp.asarray(t)
        on = (t >= t_on) & (t < t_off)
        return jnp.where(on, U, 0.0) + 0.0 * jnp.asarray(x)

    def v(x, y, t):
        return jnp.zeros_like(jnp.asarray(x), dtype=jnp.float32)

    return Winds2D(u=u, v=v)


def test_wind_pulse_on_off_relight_cycle():
    DT = 600.0
    ws = FR.MinimalWindsea(12.0, 0.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, 17, 100e3, 17, periodic_boundary=(True, True))
    model = WaveGrowth2D(grid, _pulse_winds(), sett,
                         config=WaveGrowth2DConfig(periodic_boundary=True))
    ms = model.init_state()
    step = jax.jit(model.step)

    # phase 1: wind on -> growth
    for _ in range(6):
        ms = step(ms)
    e_peak = float(ms.state[..., 0].mean())
    assert e_peak > 0
    assert bool(np.asarray(ms.particles.on).all())

    # phase 2: wind off -> waves propagate/dissipate; below minimal state
    # the reseed machine turns nodes off (no wind to reseed from)
    n_off_total = 0
    for _ in range(24):  # 4 hours of calm
        ms = step(ms)
        n_off_total += int(ms.metrics.n_off)
    e_calm = float(ms.state[..., 0].mean())
    assert e_calm < e_peak  # dissipation without input
    assert int(ms.metrics.n_failed) == 0
    assert np.all(np.isfinite(np.asarray(ms.state)))


def test_wind_returns_relights_particles():
    """calm -> all off; wind returns -> re-light in the advance phase
    (mapping_2D.jl:172-185)."""
    DT = 600.0
    ws = FR.MinimalWindsea(12.0, 0.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, 13, 100e3, 13, periodic_boundary=(True, True))

    # wind off until 1 h, then on
    def u(x, y, t):
        return jnp.where(jnp.asarray(t) >= 3600.0, 12.0, 0.0) + 0.0 * jnp.asarray(x)

    winds = Winds2D(u=u, v=lambda x, y, t: jnp.zeros_like(jnp.asarray(x)))
    model = WaveGrowth2D(grid, winds, sett,
                         config=WaveGrowth2DConfig(periodic_boundary=True))
    ms = model.init_state()
    assert not bool(np.asarray(ms.particles.on).any())  # calm seeding

    step = jax.jit(model.step)
    relights = 0
    for _ in range(12):
        ms = step(ms)
        relights += int(ms.metrics.n_relight) + int(ms.metrics.n_reseed)
    assert relights > 0
    assert bool(np.asarray(ms.particles.on).any())
    assert float(ms.state[..., 0].max()) > 0
