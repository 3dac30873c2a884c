"""1D model under the Simulation driver + 1D HDF5 store layout."""

import os

import h5py
import numpy as np

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds_1d
from picles_tpu.models.wave_growth_1d import (WaveGrowth1D, WaveGrowth1DConfig,
                                              one_d_grid)
from picles_tpu.simulation.simulation import Simulation


def _sim(stop=3000.0):
    DT = 600.0
    ws = FR.MinimalWindsea_1d(10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=2 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = one_d_grid(0.0, 200e3, 21, periodic=False)
    model = WaveGrowth1D(grid, constant_winds_1d(10.0), sett,
                         config=WaveGrowth1DConfig(periodic_boundary=False))
    return Simulation.create(model, stop_time=stop)


def test_1d_cash_store_run():
    sim = _sim()
    sim.run(cash_store=True)
    arr = sim.store.as_array()
    assert arr.shape == (7, 21, 3)  # initial + 6 steps
    assert arr[-1, 1:-1, 0].max() > arr[0, 1:-1, 0].max()


def test_1d_hdf5_store(tmp_path):
    sim = _sim(stop=1800.0)
    sim.initialize()
    sim.init_state_store(str(tmp_path))
    sim.run(store=True)
    # winds forcing alongside the state (add_winds_forcing_to_store analog)
    x = np.asarray(sim.model.grid.x)
    t = np.arange(sim.n_steps() + 1) * sim.dt
    U = np.full((len(t), len(x)), 10.0)
    sim.store.add_forcing(dict(u=U), dict(time=t, x=x))
    sim.store.close()

    with h5py.File(os.path.join(str(tmp_path), "state.h5")) as f:
        assert f["waves/data"].shape == (5, 21, 3)
        assert list(f["waves"].attrs["dims"]) == ["time", "x", "state"]
        assert "forcing/u" in f
        assert f["forcing/u"].shape == (5, 21)


def test_1d_checkpoint_resume(tmp_path):
    sim = _sim()
    sim.run()
    p = sim.checkpoint(str(tmp_path / "ck1d"))
    sim2 = _sim(stop=6000.0)
    sim2.pickup(p)
    sim2.run()
    assert float(sim2.state.time) > float(sim.state.time)
    assert np.all(np.isfinite(np.asarray(sim2.state.state)))
