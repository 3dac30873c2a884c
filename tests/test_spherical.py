"""Spherical grid + great-circle propagation tests (reference T02/T03
sphere analogs: T02_single_particle_2d_great_circle.jl,
T03_PIC_sphere_aqua.jl — asserting instead of plotting)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds
from picles_tpu.grids.spherical import (EARTH_RADIUS, cal_dx_meters,
                                        cal_dy_meters,
                                        propagation_correction_coef,
                                        spherical_grid_2d)
from picles_tpu.models.state import Particles2D
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig
from picles_tpu.ops.rhs import RHSParams, TermFlags, particle_equations
from picles_tpu.ops.tsit5 import SolverConfig, integrate_to


def test_metric_arrays():
    g = spherical_grid_2d(0.0, 10.0, 11, 0.0, 60.0, 7)
    # dx in meters shrinks with latitude like cos(lat)
    dxm = np.asarray(g.dx_m)
    lat = np.asarray(g.y)
    ratio = dxm[5, -1] / dxm[5, 0]
    assert np.isclose(ratio, math.cos(math.radians(60.0))
                      / math.cos(math.radians(0.0)), rtol=1e-3)
    # dy approx R * dtheta
    dym = np.asarray(g.dy_m)
    assert np.isclose(dym[3, 3], EARTH_RADIUS * math.radians(10.0), rtol=1e-3)


def test_propagation_correction_coef_clamped():
    c = propagation_correction_coef(np.array([0.0, 45.0, -45.0, 89.9]))
    assert c[0] == 0.0
    assert c[1] > 0 and np.isclose(c[1], math.tan(math.radians(45)) / 6.3710e6)
    assert np.isclose(c[2], -c[1])
    assert np.isclose(c[3], 60.0 / 6.3710e6)  # clamp at tan = 60


def test_great_circle_conserves_speed_and_curves_equatorward():
    """Eastward group velocity at 45N: |cg| conserved, cg_y turns negative
    (the S_sphere rotation, reference particle_waves_v5.jl:521-530)."""
    pars_rhs = particle_equations(
        lambda x, y, t: jnp.zeros_like(jnp.asarray(x)),
        lambda x, y, t: jnp.zeros_like(jnp.asarray(x)),
        flags=TermFlags(input=False, dissipation=False, peak_shift=False,
                        direction=False))
    lat = 45.0
    pc = float(propagation_correction_coef(np.array([lat]))[0])
    # projection: degrees-per-meter on the sphere
    dxm = EARTH_RADIUS * math.cos(math.radians(lat)) * math.pi / 180.0
    dym = EARTH_RADIUS * math.pi / 180.0
    M = jnp.asarray([[1.0 / dxm, 0.0], [0.0, 1.0 / dym]])
    aux = RHSParams(x=jnp.zeros(1), y=jnp.full((1,), lat), M=M[None],
                    pc=jnp.full((1,), pc))
    z0 = jnp.asarray([[math.log(1e-3), 10.0, 0.0, 0.0, 0.0]])
    res = integrate_to(pars_rhs, z0, jnp.zeros(1), jnp.full((1,), 6 * 3600.0),
                       jnp.full((1,), 1.0), aux, jnp.array([True]),
                       SolverConfig(abstol=1e-8, reltol=1e-8))
    z = np.asarray(res.z[0])
    speed0, speed1 = 10.0, math.hypot(z[1], z[2])
    assert abs(speed1 / speed0 - 1) < 1e-3          # |cg| conserved
    assert z[2] < -0.1                              # curved equatorward (NH)
    # eastward displacement approximately cg * t in local degrees
    assert np.isclose(z[3], 10.0 * 6 * 3600.0 / dxm, rtol=0.05)


def test_sphere_aqua_blob_advection():
    """Propagation-only blob on an aqua planet drifts east at the right
    rate and conserves energy away from boundaries (T03 analog)."""
    DT = 1800.0
    ws = FR.MinimalWindsea(1.0, 1.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=10 * 24 * 3600.0, dt=1.0,
                       dtmin=1e-2, force_dtmin=True)
    grid = spherical_grid_2d(0.0, 90.0, 46, 0.0, 40.0, 21,
                             periodic_boundary=(True, False))
    flags = TermFlags(input=False, dissipation=False, peak_shift=False,
                      direction=False)
    model = WaveGrowth2D(grid, constant_winds(0.0, 0.0), sett, flags=flags,
                         config=WaveGrowth2DConfig(periodic_boundary=False,
                                                   halo=4))
    ms = model.init_state()

    # plant a blob of energy moving east at mid-latitude
    nx, ny = grid.nx, grid.ny
    on = np.zeros((nx, ny), bool)
    z = np.asarray(ms.particles.z).copy()
    blob = slice(8, 13), slice(8, 13)
    on[blob] = True
    # E = 0.1 (Hs ~ 1.3 m swell): momentum stays above the minimal-state
    # threshold so the remesh gather keeps the blob alive
    z[..., 0] = math.log(0.1)
    z[..., 1] = 10.0  # eastward
    z[..., 2] = 0.0
    z[..., 3:] = 0.0
    import dataclasses
    ms = dataclasses.replace(
        ms, particles=Particles2D.from_z(jnp.asarray(z, jnp.float32),
                                      ms.particles.t, ms.particles.dt,
                                      jnp.asarray(on)))

    step = jax.jit(model.step)
    ms1 = step(ms)
    e1 = np.asarray(ms1.state[..., 0])
    total1 = e1.sum()
    com1 = (np.arange(nx)[:, None] * e1).sum() / total1

    n_more = 5
    for _ in range(n_more):
        ms1 = step(ms1)
    e2 = np.asarray(ms1.state[..., 0])
    total2 = e2.sum()
    com2 = (np.arange(nx)[:, None] * e2).sum() / total2

    # energy approximately conserved (blob well inside domain; small loss to
    # below-threshold tails going off)
    assert total2 > 0.85 * total1
    # eastward drift: cells per step = cg*DT/dx_m at blob latitude
    lat = float(grid.y[0, 10])
    dxm = EARTH_RADIUS * math.cos(math.radians(lat)) * math.radians(2.0)
    expected = 10.0 * DT * n_more / dxm
    assert np.isclose(com2 - com1, expected, rtol=0.25)
    assert int(ms1.metrics.n_failed) == 0
