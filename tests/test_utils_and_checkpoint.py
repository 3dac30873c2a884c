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


def test_record_trajectories_sub_dt_saving_step():
    """ODESettings.saving_step < DT records sub-DT particle histories
    (the reference's saveat=saving_step integrator solutions,
    particle_waves_v5.jl:60).  Locked with fixed-substep mode: the
    sub-window shadow advance takes the identical substep sequence as the
    in-step advance, so the last save point must equal the post-advance
    (pre-remesh guards aside) state to f32 ulp."""
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    # fixed 30 s substeps: stable through the young-windsea transient
    # (75 s blows up — the adaptive path would shrink, fixed mode cannot)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=150.0,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=30.0,
                       dtmin=1e-4, force_dtmin=True, adaptive=False)
    grid = cartesian_box(100e3, 9, 100e3, 9, periodic_boundary=(True, True))
    model = WaveGrowth2D(grid, constant_winds(10.0, 10.0), sett,
                         config=WaveGrowth2DConfig(periodic_boundary=True))
    ms = model.init_state()
    final, hist = PT.record_trajectories(model, ms, 3)
    K = 4  # round(600 / 150)
    assert hist["z_fine"].shape == (3 * K, 9, 9, 5)
    assert hist["t_fine"].shape == (3 * K, 9, 9)
    tf = np.asarray(hist["t_fine"])[:, 4, 4]
    np.testing.assert_allclose(tf, 150.0 * np.arange(1, 3 * K + 1), rtol=1e-6)
    # sub-DT samples refine the per-DT history: every K-th fine sample is
    # an advance landing on a DT boundary; the raw in-window energies grow
    lne_fine = np.asarray(hist["z_fine"])[:, 4, 4, 0]
    assert np.all(np.diff(lne_fine[:K]) > 0)  # young windsea grows within DT
    # exactness at the first step end (before any remesh rewrote z):
    # fixed substeps (75 s) tile the 150 s save windows, so the shadow
    # advance equals a one-shot advance to DT
    from picles_tpu.ops.tsit5 import integrate_to
    P = ms.particles
    res = integrate_to(model.rhs, P.z, P.t, P.t + DT, P.dt, model.aux,
                       P.on & model.active_mask, model.solver)
    np.testing.assert_allclose(lne_fine[K - 1],
                               np.asarray(res.z)[4, 4, 0], rtol=1e-6)


def test_record_trajectories_default_saving_step_is_dt():
    """saving_step == DT (the default _model config): no z_fine entry,
    identical behavior to the per-DT history."""
    model = _model(n=9)
    ms = model.init_state()
    _, hist = PT.record_trajectories(model, ms, 2)
    assert "z_fine" not in hist
    assert hist["z"].shape == (2, 9, 9, 5)


def test_load_era5_shaped_file_reference_names(tmp_path):
    """Reference-fidelity fixture: a file shaped like the reference's
    actual ERA5 blob (era5_surfacewinds_202301_10days_6hourly_1deg.nc,
    T03_PIC_tripolar_realistic.jl:54-71) — variables lon/lat/time/U10N/
    V10N, CF [time, lat, lon] layout, 6-hourly time axis in HOURS since an
    epoch.  The loader must apply the hours->relative-seconds conversion
    (the reference's Dates.Millisecond step) and drive a model run."""
    import h5py

    from picles_tpu.forcing.winds import load_gridded_winds_2d
    from picles_tpu.models.wave_growth_2d import (WaveGrowth2D,
                                                  WaveGrowth2DConfig)

    nt, nlat, nlon = 8, 7, 9
    hours = 1_043_712.0 + 6.0 * np.arange(nt)       # ERA5 epoch-hours style
    lons = np.linspace(0.0, 80e3, nlon)             # project-plane coords
    lats = np.linspace(0.0, 60e3, nlat)
    rng = np.random.default_rng(3)
    U = (10.0 + 2.0 * rng.standard_normal((nt, nlat, nlon))).astype(np.float32)
    V = (5.0 + rng.standard_normal((nt, nlat, nlon))).astype(np.float32)
    path = str(tmp_path / "era5_surfacewinds_6hourly.nc")
    with h5py.File(path, "w") as f:
        f["U10N"] = U
        f["V10N"] = V
        f["lon"] = lons
        f["lat"] = lats
        f["time"] = hours

    gw = load_gridded_winds_2d(path, u_name="U10N", v_name="V10N",
                               x_name="lon", y_name="lat",
                               time_scale=3600.0, relative_time=True)
    assert gw.t0 == 0.0 and gw.dt == 6 * 3600.0     # seconds since frame 0
    # on-node, frame-2 sample (t = 12 h in seconds)
    got = float(gw.u(jnp.asarray(lons[4]), jnp.asarray(lats[3]),
                     jnp.asarray(12 * 3600.0)))
    assert got == float(U[2, 3, 4])

    # the loaded forcing drives a model end-to-end
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(80e3, 9, 60e3, 7, periodic_boundary=(True, True))
    model = WaveGrowth2D(grid, gw.as_winds(), sett,
                         config=WaveGrowth2DConfig(periodic_boundary=True))
    assert model.gridded_winds is gw
    ms = model.init_state()
    ms, _ = model.step_n(ms, 2)
    assert np.all(np.isfinite(np.asarray(ms.state)))
    assert int(ms.metrics.n_failed) == 0


def test_record_trajectories_sub_dt_1d_boundary_lanes_held():
    """1D sub-DT histories use the 1D step's advance mask (on & ~boundary):
    non-periodic boundary lanes must stay constant in z_fine exactly as
    they do in the real step."""
    from picles_tpu.forcing.winds import constant_winds_1d
    from picles_tpu.models.wave_growth_1d import (WaveGrowth1D,
                                                  WaveGrowth1DConfig,
                                                  one_d_grid)

    DT = 600.0
    ws = FR.MinimalWindsea_1d(10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=150.0,
                       timestep=DT, total_time=6 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = one_d_grid(0.0, 200e3, 11, periodic=False)
    model = WaveGrowth1D(grid, constant_winds_1d(10.0), sett,
                         config=WaveGrowth1DConfig(periodic_boundary=False))
    ms = model.init_state()
    z0_bnd = np.asarray(ms.particles.z)[0].copy()
    _, hist = PT.record_trajectories(model, ms, 2)
    zf = np.asarray(hist["z_fine"])    # [2*4, nx, 3]
    # boundary lane 0 never integrates: all fine samples of step 1 equal
    # its initial state
    for k in range(4):
        np.testing.assert_array_equal(zf[k, 0], z0_bnd)
    # an interior lane does evolve within the window
    assert not np.allclose(zf[0, 5], np.asarray(ms.particles.z)[5])
