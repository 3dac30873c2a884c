"""1D model tests + B01 wave-growth regression (reference
tests/B01_1D_regtest_wave_growth.jl, made asserting).

The B01 check pins the model physics against the analytic Dulov et al. 2020
duration-limited growth law: non-dimensionalized energy must converge onto
the fetch-law curve and collapse across wind speeds.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds_1d
from picles_tpu.models.wave_growth_1d import (ParticleDefaults1D,
                                              WaveGrowth1D,
                                              WaveGrowth1DConfig, one_d_grid)

G = 9.81


def _model(U10=10.0, DT=600.0, nx=31, Lx=500e3, periodic=False):
    ws = FR.MinimalWindsea_1d(U10, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=2 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = one_d_grid(0.0, Lx, nx, periodic=periodic)
    return WaveGrowth1D(grid, constant_winds_1d(U10), sett,
                        config=WaveGrowth1DConfig(periodic_boundary=periodic))


def _dulov_energy(t, U10):
    """Analytic duration-limited JONSWAP energy via the Dulov tau->fetch map."""
    tau = G * t / U10
    Xt = float(FR.X_tilde_from_tau(tau))
    fm = 3.5 * (G / U10) * Xt ** (-0.33)
    aj = 0.033 * (fm * U10 / G) ** 0.67
    return 0.31 * G ** 2 * aj * (fm * 2 * math.pi) ** (-4)


def test_seeding_1d():
    model = _model()
    ms = model.init_state()
    ws = FR.get_initial_windsea_1d(10.0, 600.0)
    assert bool(ms.particles.on[5])
    np.testing.assert_allclose(float(ms.state[5, 0]), float(ws.E), rtol=1e-5)
    # m_x = E / (2 cg)
    np.testing.assert_allclose(float(ms.state[5, 1]),
                               float(ws.E) / (2 * float(ws.cg_bar_x)),
                               rtol=1e-5)


def test_boundary_nodes_stay_off_nonperiodic():
    model = _model(periodic=False)
    ms = model.init_state()
    step = jax.jit(model.step)
    for _ in range(4):
        ms = step(ms)
    assert float(ms.state[0, 0]) == 0.0
    assert not bool(ms.particles.on[0])
    assert not bool(ms.particles.on[-1])


def test_b01_duration_limited_growth_converges_to_dulov():
    """Center-of-domain energy approaches the analytic duration-limited
    curve from above and lands within ~60% after 12 h (B01 analog)."""
    model = _model(U10=10.0, nx=31)
    ms = model.init_state()
    step = jax.jit(model.step)
    ratios = []
    for k in range(1, 73):
        ms = step(ms)
        if k % 24 == 0:
            t = k * 600.0
            ratios.append(float(ms.state[15, 0]) / _dulov_energy(t, 10.0))
    assert all(r1 > r2 for r1, r2 in zip(ratios, ratios[1:]))  # converging
    assert 0.7 < ratios[-1] < 1.6
    assert int(ms.metrics.n_failed) == 0


def test_b01_nondimensional_collapse_across_wind_speeds():
    """E~ = E g^2/U^4 at equal t~ = g t/U must collapse across U10
    (the non-dimensionalization at the heart of B01)."""
    t_tilde_target = 30000.0
    etils = []
    for U10 in (5.0, 10.0, 20.0):
        DT = 600.0
        t_target = t_tilde_target * U10 / G
        n = int(round(t_target / DT))
        model = _model(U10=U10, nx=21, Lx=1000e3 * (U10 / 10.0) ** 2)
        ms = model.init_state()
        ms, _ = model.step_n(ms, n)
        e = float(ms.state[10, 0])
        etils.append(e * G ** 2 / U10 ** 4)
    m = np.mean(etils)
    assert np.all(np.abs(np.array(etils) / m - 1.0) < 0.25), etils


def test_b01_fetch_profile_monotone():
    """Steady state: energy grows with fetch from the upwind boundary then
    saturates at the duration limit."""
    model = _model(U10=10.0, nx=31, Lx=500e3)
    ms = model.init_state()
    ms, _ = model.step_n(ms, 72)  # 12 h
    e = np.asarray(ms.state[:, 0])
    # interior, upwind half: monotone increase
    up = e[1:10]
    assert np.all(np.diff(up) > -1e-6)
    assert e[10] > e[2]


def test_periodic_1d_homogeneous():
    model = _model(U10=10.0, nx=21, periodic=True)
    ms = model.init_state()
    ms, _ = model.step_n(ms, 12)
    e = np.asarray(ms.state[:, 0])
    assert e.std() / e.mean() < 1e-3


def test_negative_wind_symmetric():
    """U10 -> -U10 mirrors the momentum sign and keeps energy equal."""
    mp = _model(U10=10.0, nx=21, periodic=True)
    mn = _model(U10=-10.0, nx=21, periodic=True)
    sp, _ = mp.step_n(mp.init_state(), 6)
    sn, _ = mn.step_n(mn.init_state(), 6)
    # f32 scatter rounding differs between left/right-moving particles
    np.testing.assert_allclose(np.asarray(sp.state[:, 0]),
                               np.asarray(sn.state[:, 0]), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sp.state[:, 1]),
                               -np.asarray(sn.state[:, 1]), rtol=1e-3)


def test_fixed_defaults_1d():
    d = ParticleDefaults1D(lne=math.log(1e-4), cg_x=2.0)
    model = _model()
    model2 = WaveGrowth1D(model.grid, model.winds, model.settings,
                          config=WaveGrowth1DConfig(periodic_boundary=False,
                                                    ode_init_type=d))
    ms = model2.init_state()
    np.testing.assert_allclose(float(ms.particles.z[4, 0]), d.lne, rtol=1e-6)


def test_b01_growth_invariant_to_DT():
    """The reference B01 sweeps DT in {5..60 min}: the physical growth
    curve must be (near-)independent of the remeshing step — E(t) at a
    matched time agrees across DT within a few percent (the remesh
    kill/reseed cycle adds only O(DT) discretization)."""
    t_target = 12 * 3600.0
    energies = []
    for DT in (300.0, 600.0, 1800.0):
        model = _model(U10=10.0, DT=DT, nx=31)
        ms = model.init_state()
        ms, _ = model.step_n(ms, int(round(t_target / DT)))
        energies.append(float(ms.state[15, 0]))
    m = np.mean(energies)
    assert np.all(np.abs(np.array(energies) / m - 1.0) < 0.05), energies


def test_b01_growth_invariant_to_resolution():
    """The reference B01 sweeps Nx in {21..201}: duration-limited growth at
    the domain center is resolution-independent (one particle per node,
    homogeneous winds)."""
    energies = []
    for nx in (21, 51, 101):
        model = _model(U10=10.0, nx=nx, Lx=500e3)
        ms = model.init_state()
        ms, _ = model.step_n(ms, 72)   # 12 h
        energies.append(float(ms.state[nx // 2, 0]))
    m = np.mean(energies)
    assert np.all(np.abs(np.array(energies) / m - 1.0) < 0.02), energies
