"""B02/B03 analog: 2D multi-resolution regression under stored netCDF winds.

The reference's strongest 2D regression drives the same netCDF wind
forcing on grids scaled by sqrt(2) steps and stores each run to HDF5
(/root/reference/tests/B02_2D_regtest_netCDF.jl:59-77 interpolate_winds
with multiplyer, :93-101 make_reg_test_store; the moving-fetch variant is
B03_2D_regtest_moving_fetch_netCDF.jl).  The reference only stores; this
test ASSERTS: the nondimensionalized Hs fields must converge across
resolutions (successive-refinement RMS differences shrink) and across DT
refinement.
"""

import math
import os

import h5py
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import load_gridded_winds_2d
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig
from picles_tpu.simulation.simulation import Simulation

L = 200e3
DT = 600.0
T = 4 * 3600.0


@pytest.fixture(scope="module")
def wind_file(tmp_path_factory):
    """Synthetic ERA5-shaped netCDF wind file: a gaussian blob moving +x
    (the SWAMP-case analog of the reference's stored wind data)."""
    nt, nyw, nxw = 9, 12, 12
    ts = np.linspace(0, 2 * T, nt)
    xs = np.linspace(0, L, nxw)
    ys = np.linspace(0, L, nyw)
    Tg, Yg, Xg = np.meshgrid(ts, ys, xs, indexing="ij")
    x0 = 0.25 * L + 6.0 * Tg
    u = 2.0 + 10.0 * np.exp(-(((Xg - x0) / (0.3 * L)) ** 2
                              + ((Yg - 0.5 * L) / (0.4 * L)) ** 2))
    v = 0.3 * u
    path = str(tmp_path_factory.mktemp("b02") / "winds.nc")
    with h5py.File(path, "w") as f:
        f["u10"], f["v10"] = u.astype(np.float32), v.astype(np.float32)
        f["longitude"], f["latitude"], f["time"] = xs, ys, ts
    return path


def _run_stored(wind_path, store_dir, nx, dt=DT):
    """One stored run at resolution nx: HDF5 layout exactly like the
    reference's make_reg_test_store (init_state_store! + run!(store=true)).
    Returns (axis_nodes, final_Hs_field) read back FROM THE FILE."""
    gw = load_gridded_winds_2d(wind_path)
    ws = FR.MinimalWindsea(10.0, 10.0, dt)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=dt,
                       timestep=dt, total_time=T, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(L, nx, L, nx, periodic_boundary=(False, False))
    m = WaveGrowth2D(grid, gw, sett,
                     config=WaveGrowth2DConfig(periodic_boundary=False))
    sim = Simulation.create(m, stop_time=T)
    sim.initialize()
    os.makedirs(store_dir, exist_ok=True)
    sim.init_state_store(store_dir)
    sim.run(store=True)
    sim.store.close()
    with h5py.File(os.path.join(store_dir, "state.h5")) as f:
        data = f["waves/data"][:]
    assert np.all(np.isfinite(data))
    e_final = data[-1, ..., 0]
    return np.linspace(0, L, nx), 4.0 * np.sqrt(np.maximum(e_final, 0.0))


def test_b02_resolution_convergence(wind_file, tmp_path):
    """Same netCDF forcing at grid resolutions scaled by sqrt(2): the
    final nondimensional Hs field converges — each sqrt(2) refinement at
    least halves nothing but must strictly shrink the successive RMS
    difference, and the finest pair agrees to ~1%."""
    sizes = [int(math.ceil(11 * math.sqrt(2) ** k)) for k in range(3)]
    fields = {}
    for nx in sizes:
        ax, hs = _run_stored(wind_file, str(tmp_path / f"r{nx}"), nx)
        fields[nx] = (ax, hs)

    # probe the shared interior on a fixed grid (bilinear per run)
    probe = np.linspace(0.15 * L, 0.85 * L, 25)
    PX, PY = np.meshgrid(probe, probe, indexing="ij")
    pts = np.stack([PX.ravel(), PY.ravel()], -1)
    hs_p = {nx: RegularGridInterpolator((ax, ax), hs)(pts)
            for nx, (ax, hs) in fields.items()}
    norm = np.abs(hs_p[sizes[-1]]).max()
    assert norm > 0.5  # real waves grew

    errs = [float(np.sqrt(np.mean((hs_p[a] - hs_p[b]) ** 2)) / norm)
            for a, b in zip(sizes[:-1], sizes[1:])]
    # measured on this config: ~[0.017, 0.012] and decreasing
    assert errs[1] < errs[0], errs
    assert errs[-1] < 0.03, errs


def test_b02_dt_refinement_converges(wind_file, tmp_path):
    """DT refinement at fixed resolution: halving the model step changes
    the final field by ~1% (the adaptive sub-stepping already resolves the
    ODE; DT only controls remesh cadence)."""
    nx = 16
    ax, hs_dt = _run_stored(wind_file, str(tmp_path / "dt0"), nx, dt=DT)
    _, hs_dt2 = _run_stored(wind_file, str(tmp_path / "dt1"), nx, dt=DT / 2)
    norm = np.abs(hs_dt).max()
    err = float(np.sqrt(np.mean((hs_dt - hs_dt2) ** 2)) / norm)
    # measured ~0.013 on this config; a wrong-cadence bug would be >>5%
    assert err < 0.04, err
