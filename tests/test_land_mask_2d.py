"""Land-mask propagation on a Cartesian grid (reference
tests/T03_PIC_propagation_2d_land.jl analog, asserting instead of plotting).

A propagation-only swell blob travels east into a meridional land wall:
land nodes never host active particles, the land-boundary fringe (mask==2)
never re-emits (no gather there, reference core_2D.jl:360-366 +
mapping_2D.jl:306-326), so the wall absorbs the blob — while the same blob
on an open ocean conserves its energy.
"""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds
from picles_tpu.grids.cartesian import cartesian_grid_2d
from picles_tpu.models.state import Particles2D
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig
from picles_tpu.ops.rhs import TermFlags

DT = 600.0
NX, NY = 51, 21
LX, LY = 100e3, 40e3  # dx = 2 km


def _model(mask):
    ws = FR.MinimalWindsea(1.0, 1.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=10 * 24 * 3600.0, dt=1.0,
                       dtmin=1e-2, force_dtmin=True)
    grid = cartesian_grid_2d(0.0, LX, NX, 0.0, LY, NY, mask=mask,
                             periodic_boundary=(True, True))
    flags = TermFlags(input=False, dissipation=False, peak_shift=False,
                      direction=False)
    return WaveGrowth2D(grid, constant_winds(0.0, 0.0), sett, flags=flags,
                        config=WaveGrowth2DConfig(periodic_boundary=True,
                                                  halo=4))


def _plant_blob(model):
    """Eastward swell blob in the west of the domain."""
    ms = model.init_state()
    on = np.zeros((NX, NY), bool)
    on[6:12, 6:14] = True
    z = np.asarray(ms.particles.z).copy()
    z[..., 0] = math.log(0.1)   # E = 0.1 (Hs ~ 1.3 m)
    z[..., 1] = 10.0            # eastward 10 m/s
    z[..., 2] = 0.0
    z[..., 3:] = 0.0
    return dataclasses.replace(
        ms, particles=Particles2D.from_z(jnp.asarray(z, jnp.float32),
                                         ms.particles.t, ms.particles.dt,
                                         jnp.asarray(on)))


def test_mask_codes_around_island():
    mask = np.ones((NX, NY), bool)
    mask[30:34, :] = False
    g = cartesian_grid_2d(0.0, LX, NX, 0.0, LY, NY, mask=mask,
                          periodic_boundary=(True, True))
    m = np.asarray(g.mask)
    assert np.all(m[31:33, :] == 0)          # island interior: land
    assert np.all(m[30, :] == 2) and np.all(m[33, :] == 2)  # fringe
    assert np.all(m[:30, :] == 1) and np.all(m[34:, :] == 1)  # open ocean
    # fully periodic domain: no grid-boundary code anywhere
    assert not np.any(m == 3)


def test_land_wall_absorbs_blob():
    mask = np.ones((NX, NY), bool)
    mask[30:34, :] = False  # meridional wall spanning all y

    land = _model(mask)
    open_sea = _model(np.ones((NX, NY), bool))

    ms_l, ms_o = _plant_blob(land), _plant_blob(open_sea)

    step_l = jax.jit(land.step)
    step_o = jax.jit(open_sea.step)
    # the Eulerian state is (re)built by each step's deposit, so take the
    # post-first-step field as the blob's reference energy
    ms_l, ms_o = step_l(ms_l), step_o(ms_o)
    e0 = float(jnp.sum(ms_l.state[..., 0]))
    assert e0 > 0

    # blob center starts ~x-index 9, wall at 30; cg*DT/dx = 3 cells/step;
    # 20 steps moves the blob ~60 cells — far past the wall position.
    for _ in range(19):
        ms_l = step_l(ms_l)
        ms_o = step_o(ms_o)
        # land nodes never host active particles
        assert not bool(jnp.any(ms_l.particles.on & (land.grid.mask == 0)))
        assert int(ms_l.metrics.n_failed) == 0

    e_land = float(jnp.sum(ms_l.state[..., 0]))
    e_open = float(jnp.sum(ms_o.state[..., 0]))
    # open ocean (periodic) conserves the blob up to small CIC/threshold loss
    assert e_open > 0.8 * e0
    # the wall absorbed nearly everything
    assert e_land < 0.05 * e0
    # whatever energy remains sits west of the wall or in its fringe deposit;
    # no energy made it past the island (columns 34.. on this step's deposit)
    east = np.asarray(ms_l.state[..., 0])[34:, :]
    assert float(east.sum()) < 1e-6 * max(e0, 1.0)
