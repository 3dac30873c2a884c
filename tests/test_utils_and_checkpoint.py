"""Checkpoint/resume, layers, CLI, particle tools, diagnostics tests."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig
from picles_tpu.simulation.checkpoint import load_checkpoint, save_checkpoint
from picles_tpu.simulation.simulation import Simulation
from picles_tpu.utils import particle_tools as PT
from picles_tpu.utils.cli import arg_settings, init_standard
from picles_tpu.utils.diagnostics import (StepTimer, check_nans, max_energy,
                                          mean_of_state, step_summary)


def _model(n=15, layers=1):
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, n, 100e3, n, periodic_boundary=(True, True))
    return WaveGrowth2D(grid, constant_winds(10.0, 10.0), sett,
                        config=WaveGrowth2DConfig(periodic_boundary=True,
                                                  layers=layers))


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    model = _model()
    ms = model.init_state()
    ms, _ = model.step_n(ms, 3)
    p = save_checkpoint(str(tmp_path / "ck"), ms)
    ms2 = load_checkpoint(p)
    for a, b in zip(jax.tree.leaves(ms), jax.tree.leaves(ms2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path):
    """checkpoint at step 3, resume, run 3 more == straight 6 steps."""
    model = _model()
    ms = model.init_state()
    ms6, _ = model.step_n(ms, 6)

    ms3, _ = model.step_n(model.init_state(), 3)
    p = save_checkpoint(str(tmp_path / "ck"), ms3)
    ms3b = load_checkpoint(p)
    ms6b, _ = model.step_n(ms3b, 3)
    np.testing.assert_allclose(np.asarray(ms6.state), np.asarray(ms6b.state),
                               rtol=1e-6)
    assert float(ms6b.time) == float(ms6.time)


def test_simulation_pickup(tmp_path):
    model = _model()
    sim = Simulation.create(model, stop_time=1800.0)
    sim.run()
    ck = sim.checkpoint(str(tmp_path / "state_ck"))
    sim2 = Simulation.create(model, stop_time=3600.0)
    sim2.pickup(ck)
    assert float(sim2.state.time) == float(sim.state.time)
    sim2.run()
    assert float(sim2.state.time) > float(sim.state.time)


def test_layers_vmap():
    model = _model(layers=3)
    ms = model.init_state_layers()
    assert ms.state.shape == (3, 15, 15, 3)
    step = jax.jit(model.step_layers)
    ms = step(ms)
    ms = step(ms)
    s = np.asarray(ms.state)
    # identical layers evolve identically
    np.testing.assert_allclose(s[0], s[1], rtol=1e-6)
    np.testing.assert_allclose(s[0], s[2], rtol=1e-6)
    assert np.asarray(ms.metrics.n_active).shape == (3,)


def test_cli_parser():
    p = arg_settings()
    a = p.parse_args(["--T", "2", "--DT", "10", "--Nx", "51", "--U10", "10",
                      "--periodic"])
    assert a.T == 2.0 and a.DT == 10.0 and a.Nx == 51 and a.periodic
    assert a.c_beta == 4.0 and a.r_g0 == 0.85


def test_init_standard():
    ps, pars, ws, cid = init_standard(10.0, 0.0, 600.0)
    assert np.isclose(ps.lne, float(FR.get_initial_windsea(10.0, 0.0,
                                                           300.0).lne))
    assert pars.r_g == 0.85
    assert pars.C_varphi == cid.c_beta  # parity quirk, Initialization.jl:21


def test_record_trajectories_and_dataframe():
    model = _model()
    ms = model.init_state()
    final, hist = PT.record_trajectories(model, ms, 4)
    assert hist["z"].shape == (4, 15, 15, 5)
    df = PT.particle_to_dataframe(hist["z"], hist["t"], (7, 7))
    assert list(df.columns[:6]) == ["time", "lne", "cgx", "cgy", "x", "y"]
    assert len(df) == 4
    assert (df["E"] > 0).all()
    assert df["time"].is_monotonic_increasing


def test_iteration_mask():
    t = np.array([0.0, 1.0, 2.0, 0.5, 1.5, 0.2])
    m = PT.create_iteration_mask(t)
    np.testing.assert_array_equal(m, [1, 1, 1, 2, 2, 3])


def test_diagnostics_and_nan_checker():
    model = _model()
    ms = model.init_state()
    ms = jax.jit(model.step)(ms)
    s = step_summary(ms)
    assert s["n_active"] == 225 and s["mean_e"] > 0
    check_nans(ms)  # should not raise
    import dataclasses
    bad = dataclasses.replace(ms, state=ms.state.at[0, 0, 0].set(jnp.nan))
    with pytest.raises(FloatingPointError):
        check_nans(bad)


def test_step_timer():
    model = _model()
    ms = model.init_state()
    step = jax.jit(model.step)
    timer = StepTimer()
    for _ in range(3):
        with timer.measure(sync_on=ms.state):
            ms = step(ms)
    s = timer.summary()
    assert s["n"] == 3 and s["mean_s"] > 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    """orbax backend: bit-exact restore, rebuilt by field name (dict
    flattening order differs from dataclass order)."""
    import jax
    import numpy as np

    from picles_tpu.simulation.checkpoint import (load_checkpoint,
                                                  save_checkpoint)

    m = _model()
    ms = m.init_state()
    for _ in range(2):
        ms = m.step(ms)
    p = save_checkpoint(str(tmp_path / "ck_orbax"), ms, backend="orbax")
    back = load_checkpoint(p)
    for a, b in zip(jax.tree.leaves(ms), jax.tree.leaves(back)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    a = m.step(ms)
    b = m.step(back)
    assert np.array_equal(np.asarray(a.state), np.asarray(b.state))


def test_load_gridded_winds_netcdf(tmp_path):
    """NetCDF wind forcing loader (ERA5-style file) -> GriddedWinds2D with
    CF [t, y, x] transposition and uniform-axis metadata."""
    import h5py
    import numpy as np
    import jax.numpy as jnp

    from picles_tpu.forcing.winds import load_gridded_winds_2d

    nt, ny_, nx_ = 4, 6, 5
    ts = np.arange(nt) * 3600.0
    xs = np.linspace(0.0, 40e3, nx_)
    ys = np.linspace(0.0, 50e3, ny_)
    u = np.arange(nt * ny_ * nx_, dtype=np.float32).reshape(nt, ny_, nx_)
    v = -u
    path = str(tmp_path / "winds.nc")
    with h5py.File(path, "w") as f:
        f["u10"] = u
        f["v10"] = v
        f["longitude"] = xs
        f["latitude"] = ys
        f["time"] = ts
    gw = load_gridded_winds_2d(path)
    assert gw.u_data.shape == (nt, nx_, ny_)
    # exact on-node, on-frame sample
    got = float(gw.u(jnp.asarray(xs[2]), jnp.asarray(ys[3]), jnp.asarray(ts[1])))
    assert got == float(u[1, 3, 2])
    got_v = float(gw.v(jnp.asarray(xs[2]), jnp.asarray(ys[3]), jnp.asarray(ts[1])))
    assert got_v == -float(u[1, 3, 2])
    # halfway between frames: linear in time
    mid = float(gw.u(jnp.asarray(xs[2]), jnp.asarray(ys[3]),
                     jnp.asarray(0.5 * (ts[1] + ts[2]))))
    assert abs(mid - 0.5 * (u[1, 3, 2] + u[2, 3, 2])) < 1e-3
