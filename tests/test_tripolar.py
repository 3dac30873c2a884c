"""Tripolar grid tests (reference S01_grids_Tripolar / T03_PIC_tripolar_*
analogs on the synthetic fixture; the real MOM6 supergrid files are absent
from the reference snapshot)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds
from picles_tpu.grids.base import Boundary
from picles_tpu.grids.tripolar import (calculate_distances,
                                       extract_grid_points,
                                       mom6_grid_from_supergrid,
                                       synthetic_tripolar_grid,
                                       synthetic_tripolar_supergrid)
from picles_tpu.models.state import Particles2D
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig
from picles_tpu.ops.rhs import TermFlags


def test_extract_grid_points_shapes_and_stride():
    X, Y, dx, dy, area, ang = synthetic_tripolar_supergrid(64, 48)
    for k in (2, 4, 8):
        G = extract_grid_points(X, Y, ang, k)
        assert G["t_lon"].shape == (64 // k, 48 // k)
        # T points sit khalf cells in from the corners
        assert G["t_lon"][0, 0] == X[k // 2, k // 2]


def test_calculate_distances_aggregates():
    X, Y, dx, dy, area, ang = synthetic_tripolar_supergrid(32, 24)
    GA = calculate_distances(area, dx, dy, 2, 1)
    assert GA["tarea"].shape == (16, 12)
    # area aggregation: sum of 2x2 blocks
    np.testing.assert_allclose(GA["tarea"][0, 0], area[0:2, 0:2].sum())
    np.testing.assert_allclose(GA["tarea"].sum(), area.sum(), rtol=1e-12)


def test_seam_mirror_consistency():
    """dyCv top rows must obey the seam mirror (reference :246-247)."""
    X, Y, dx, dy, area, ang = synthetic_tripolar_supergrid(32, 24)
    assert np.allclose(dy[:, -1], dy[::-1, -4])


def test_grid_build_masks_and_boundaries():
    g = synthetic_tripolar_grid(k=2)
    m = np.asarray(g.mask)
    assert g.stats.bx == Boundary.PERIODIC
    assert g.stats.by == Boundary.TRIPOLAR_NORTH
    # poles masked: some land at the top row and the south band
    assert (m[:, -1] == 0).sum() + (m[:, -1] == 2).sum() > 0
    assert np.all(m[:, 0] != 1)
    # ocean interior exists
    assert (m == 1).sum() > 0.5 * m.size


def test_projection_kernel_rotation():
    """Rotated nodes mix x/y velocity components with the documented signs
    (reference ProjetionKernel :436-459)."""
    g = synthetic_tripolar_grid(k=2)
    P = np.asarray(g.proj)
    ang = np.asarray(g.angle)
    i, j = 8, np.argmax(np.abs(ang).max(axis=0))  # a strongly rotated column
    j = int(j)
    a = ang[i, j]
    dxm = float(g.dx_m[i, j])
    dym = float(g.dy_m[i, j])
    np.testing.assert_allclose(P[i, j, 0, 0], math.cos(a) / dxm, rtol=1e-5)
    np.testing.assert_allclose(P[i, j, 0, 1], math.sin(a) / dym, rtol=1e-5)
    np.testing.assert_allclose(P[i, j, 1, 0], -math.sin(a) / dxm, rtol=1e-5)


def test_model_runs_on_tripolar_grid():
    """Forced growth on the synthetic tripolar grid: finite everywhere,
    no failures, land stays zero (T03_PIC_tripolar analog)."""
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = synthetic_tripolar_grid(k=2)
    model = WaveGrowth2D(grid, constant_winds(8.0, 8.0), sett,
                         config=WaveGrowth2DConfig(periodic_boundary=True,
                                                   halo=3))
    ms = model.init_state()
    step = jax.jit(model.step)
    for _ in range(6):
        ms = step(ms)
    e = np.asarray(ms.state[..., 0])
    assert np.all(np.isfinite(e))
    assert int(ms.metrics.n_failed) == 0
    land = np.asarray(grid.mask) == 0
    assert np.all(np.asarray(ms.particles.on)[land] == False)  # noqa: E712
    ocean = np.asarray(grid.mask) == 1
    assert e[ocean].max() > 0


def test_tripolar_gridded_realistic_like_winds():
    """Tripolar grid + land mask + spatially varying stored winds — the
    T03_PIC_tripolar_realistic analog (the reference's ERA5 file is absent
    from the snapshot; a synthetic stored wind field exercises the same
    path: gridded interpolation sampled per node over a masked global
    grid)."""
    import jax.numpy as jnp
    from picles_tpu.forcing.winds import GriddedWinds2D

    grid = synthetic_tripolar_grid(k=2)
    nx, ny = grid.nx, grid.ny

    # zonal jet + time wobble stored on a coarse lon/lat/time grid
    nt, nxa, nya = 5, 19, 13
    lon = np.linspace(0, 360, nxa)
    lat = np.linspace(-80, 90, nya)
    t = np.linspace(0, 12 * 3600.0, nt)
    T, LO, LA = np.meshgrid(t, lon, lat, indexing="ij")
    u = 12.0 * np.exp(-((LA - 40) / 20.0) ** 2) * (1 + 0.2 * np.sin(T / 4e4))
    v = 3.0 * np.sin(np.radians(LO)) * np.exp(-((LA - 40) / 25.0) ** 2)
    gw = GriddedWinds2D(u_data=jnp.asarray(u, jnp.float32),
                        v_data=jnp.asarray(v, jnp.float32),
                        x0=0.0, dx=float(lon[1] - lon[0]),
                        y0=float(lat[0]), dy=float(lat[1] - lat[0]),
                        t0=0.0, dt=float(t[1] - t[0]))

    DT = 1200.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    model = WaveGrowth2D(grid, gw.as_winds(), sett,
                         config=WaveGrowth2DConfig(periodic_boundary=True,
                                                   halo=3))
    ms = model.init_state()
    step = jax.jit(model.step)
    for _ in range(6):
        ms = step(ms)
    e = np.asarray(ms.state[..., 0])
    mask = np.asarray(grid.mask)
    assert np.all(np.isfinite(e))
    assert int(ms.metrics.n_failed) == 0
    # energy concentrated in the jet band, zero on land
    lat_nodes = np.asarray(grid.y)
    jet = (lat_nodes > 20) & (lat_nodes < 55) & (mask == 1)
    calm = (lat_nodes < -40) & (mask == 1)
    assert e[jet].mean() > 10 * max(e[calm].mean(), 1e-12)


def test_seam_crossing_in_model():
    """A northward swell blob at the top interior crosses the seam and
    reappears at the mirrored x position (T03_PIC_tripolar_seam_remap
    analog)."""
    import dataclasses

    DT = 1800.0
    ws = FR.MinimalWindsea(1.0, 1.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=10 * 24 * 3600.0, dt=1.0,
                       dtmin=1e-2, force_dtmin=True)
    grid = synthetic_tripolar_grid(k=2)
    nx, ny = grid.nx, grid.ny
    flags = TermFlags(input=False, dissipation=False, peak_shift=False,
                      direction=False)
    model = WaveGrowth2D(grid, constant_winds(0.0, 0.0), sett, flags=flags,
                         minimal_state=np.array([1e-12, 1e-20]),
                         config=WaveGrowth2DConfig(periodic_boundary=True,
                                                   halo=3))
    ms = model.init_state()

    # pick an ocean column near x = nx/4 (away from the masked poles)
    mask = np.asarray(grid.mask)
    i0 = nx // 4
    ocean_rows = np.where(mask[i0] == 1)[0]
    j0 = int(ocean_rows[-1])  # topmost ocean node in that column
    on = np.zeros((nx, ny), bool)
    on[i0, j0] = True
    z = np.zeros((nx, ny, 5), np.float32)
    z[..., 0] = math.log(0.1)
    z[i0, j0, 2] = 8.0  # northward

    ms = dataclasses.replace(
        ms, particles=Particles2D.from_z(jnp.asarray(z), ms.particles.t,
                                      ms.particles.dt, jnp.asarray(on)))
    step = jax.jit(model.step)
    total_before = None
    for k in range(10):
        ms = step(ms)
        tot = float(ms.state[..., 0].sum())
        if total_before is None:
            total_before = tot
    e = np.asarray(ms.state[..., 0])
    assert np.all(np.isfinite(e))
    # energy mass persists (allowing threshold losses)
    assert float(e.sum()) > 0.3 * total_before
    # some energy has reached the mirrored half of the seam neighborhood
    mirror_i = (nx - 2 - i0) % nx
    window = e[max(0, mirror_i - 4):mirror_i + 5, j0 - 4:]
    assert window.sum() > 0
