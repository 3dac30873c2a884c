"""Legacy ParticleMesh grid API shims (reference src/ParticleMesh.jl)."""

import numpy as np
import jax

from picles_tpu.core import fetch_relations as FR
from picles_tpu.core.constants import ODESettings
from picles_tpu.forcing.winds import constant_winds
from picles_tpu.grids.cartesian import cartesian_box
from picles_tpu.grids.legacy import (OneDGrid, OneDGridNotes, TwoDGrid,
                                     TwoDGridMesh, TwoDGridNotes)
from picles_tpu.models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig


def test_twod_grid_fields_match_reference_semantics():
    g = TwoDGrid(0.0, 100e3, 11, 0.0, 50e3, 6)   # 6-arg form
    assert (g.Nx, g.Ny, g.Ndx, g.Ndy) == (11, 6, 10, 5)
    assert g.dx == 10e3 and g.dy == 10e3
    assert g.dimx == 100e3 and g.dimy == 50e3
    g2 = TwoDGrid(100e3, 11, 50e3, 6)            # 4-arg convenience form
    assert g2 == g

    gn = TwoDGridNotes(g)
    np.testing.assert_allclose(gn.x, np.linspace(0, 100e3, 11))
    np.testing.assert_allclose(gn.y, np.linspace(0, 50e3, 6))

    mesh = TwoDGridMesh(g, skip=2)
    assert mesh.x.shape == (6, 3)
    np.testing.assert_allclose(mesh.x[:, 0], gn.x[::2])
    np.testing.assert_allclose(mesh.y[0, :], gn.y[::2])
    assert mesh.tuples.shape == (6, 3, 2)


def test_oned_grid_notes():
    g = OneDGrid(0.0, 200e3, 21)
    assert g.Ndx == 20 and g.dx == 10e3
    gn = OneDGridNotes(g)
    np.testing.assert_allclose(gn.x, np.linspace(0, 200e3, 21))


def test_legacy_grid_drops_into_model():
    """TwoDGrid(...).to_grid2d() is a drop-in WaveGrowth2D grid and matches
    a cartesian_box-built model bitwise."""
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    legacy = TwoDGrid(100e3, 13, 100e3, 13).to_grid2d()
    modern = cartesian_box(100e3, 13, 100e3, 13,
                           periodic_boundary=(True, True))
    winds = constant_winds(10.0, 10.0)
    cfg = WaveGrowth2DConfig(periodic_boundary=True)
    ma = WaveGrowth2D(legacy, winds, sett, config=cfg)
    mb = WaveGrowth2D(modern, winds, sett, config=cfg)
    sa, sb = ma.init_state(), mb.init_state()
    for _ in range(3):
        sa = ma.step(sa)
        sb = mb.step(sb)
    assert np.array_equal(np.asarray(sa.state), np.asarray(sb.state))


def test_legacy_grid_nonzero_origin_translates():
    """xmin/ymin offsets relabel coordinates; constant-wind physics is
    translation-invariant, so fields match the origin-anchored twin."""
    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    off = TwoDGrid(-50e3, 50e3, 13, 20e3, 120e3, 13).to_grid2d()
    assert float(np.asarray(off.x)[0, 0]) == -50e3
    assert float(np.asarray(off.y)[0, 0]) == 20e3
    base = TwoDGrid(100e3, 13, 100e3, 13).to_grid2d()
    winds = constant_winds(10.0, 10.0)
    cfg = WaveGrowth2DConfig(periodic_boundary=True)
    ma = WaveGrowth2D(off, winds, sett, config=cfg)
    mb = WaveGrowth2D(base, winds, sett, config=cfg)
    sa, sb = ma.init_state(), mb.init_state()
    for _ in range(2):
        sa = ma.step(sa)
        sb = mb.step(sb)
    np.testing.assert_allclose(np.asarray(sa.state), np.asarray(sb.state),
                               rtol=1e-6)


def test_legacy_grids_reject_degenerate_node_counts():
    """Nx/Ny < 2 is a clear ValueError, not a ZeroDivisionError from the
    dx = dim/(N-1) spacing computation."""
    import pytest

    from picles_tpu.grids.legacy import OneDGrid, TwoDGrid

    with pytest.raises(ValueError, match="Nx, Ny >= 2"):
        TwoDGrid(100e3, 1, 100e3, 4)
    with pytest.raises(ValueError, match="Nx, Ny >= 2"):
        TwoDGrid(0.0, 100e3, 5, 0.0, 100e3, 1)
    with pytest.raises(ValueError, match="Nx >= 2"):
        OneDGrid(0.0, 1e3, 1)
