"""T04-style regression sweep (reference tests/T04_2D_reg_test.jl:122-151):
wind directions (U10, V10) in {-10, 0, 10}^2 crossed with periodic /
non-periodic boundaries, on a small box for CI speed.  Asserts the
invariants a human would check in the reference's plots: finiteness, no
solver failures, energy growth where wind blows, symmetry between mirrored
wind directions."""

import itertools

import numpy as np
import jax
import pytest

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig

WINDS = [-10.0, 0.0, 10.0]


def _run(U, V, periodic, n=17, steps=8):
    DT = 600.0
    ws = FR.MinimalWindsea(U or 2.0, V or 2.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, n, 100e3, n,
                         periodic_boundary=(periodic, periodic))
    model = WaveGrowth2D(grid, constant_winds(U, V), sett,
                         config=WaveGrowth2DConfig(periodic_boundary=periodic))
    ms, _ = model.step_n(model.init_state(), steps)
    return model, ms


@pytest.mark.parametrize("U,V", list(itertools.product(WINDS, WINDS)))
@pytest.mark.parametrize("periodic", [True, False])
def test_t04_direction_sweep(U, V, periodic):
    model, ms = _run(U, V, periodic)
    e = np.asarray(ms.state[..., 0])
    assert np.all(np.isfinite(np.asarray(ms.state)))
    assert int(ms.metrics.n_failed) == 0
    if U == 0 and V == 0:
        # becalmed: everything off, state zero
        assert not bool(np.asarray(ms.particles.on).any())
        np.testing.assert_allclose(e, 0.0, atol=1e-12)
    else:
        interior = e[2:-2, 2:-2]
        assert interior.max() > 0
        # momentum aligned with the wind
        mx = np.asarray(ms.state[..., 1])[2:-2, 2:-2].mean()
        my = np.asarray(ms.state[..., 2])[2:-2, 2:-2].mean()
        if U:
            assert np.sign(mx) == np.sign(U)
        if V:
            assert np.sign(my) == np.sign(V)


def test_t04_mirror_symmetry():
    """(+10, 0) flipped in x equals (-10, 0) with mirrored momentum."""
    _, ms_p = _run(10.0, 0.0, True)
    _, ms_n = _run(-10.0, 0.0, True)
    ep = np.asarray(ms_p.state[..., 0])
    en = np.asarray(ms_n.state[..., 0])
    np.testing.assert_allclose(ep, en, rtol=2e-3, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ms_p.state[..., 1]),
                               -np.asarray(ms_n.state[..., 1]), rtol=2e-3,
                               atol=1e-10)


def test_t04_diagonal_equals_rotated():
    """Periodic homogeneous growth: (10,10) energy equals (−10,−10)."""
    _, a = _run(10.0, 10.0, True)
    _, b = _run(-10.0, -10.0, True)
    np.testing.assert_allclose(np.asarray(a.state[..., 0]),
                               np.asarray(b.state[..., 0]), rtol=2e-3)
