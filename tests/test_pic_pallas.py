"""Pallas CIC accumulate kernel vs the XLA pad-and-fold path (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU — see bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from picles_tpu.grids.base import Boundary, GridStats
from picles_tpu.ops import pic
from picles_tpu.ops.pic_pallas import scatter_accumulate_padded_pallas


@pytest.mark.parametrize("nx,ny,halo,bx", [(20, 16, 3, 8), (51, 51, 3, 16),
                                           (33, 200, 4, 64), (64, 24, 2, 32)])
def test_pallas_accumulate_matches_xla(nx, ny, halo, bx):
    rng = np.random.default_rng(nx + ny)
    xr = jnp.asarray(rng.uniform(-halo + 0.5, halo - 0.5, (nx, ny)), jnp.float32)
    yr = jnp.asarray(rng.uniform(-halo + 0.5, halo - 0.5, (nx, ny)), jnp.float32)
    ch = jnp.asarray(rng.uniform(0, 1, (nx, ny, 3)), jnp.float32)
    act = jnp.asarray(rng.uniform(0, 1, (nx, ny)) > 0.3)
    P1, s1 = pic.scatter_accumulate_padded(xr, yr, ch, act, halo)
    P2, s2 = scatter_accumulate_padded_pallas(xr, yr, ch, act, halo,
                                              interpret=True, block_x=bx)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), rtol=1e-5,
                               atol=1e-6)
    assert int(s1.clamped) == int(s2.clamped)


def test_scatter_mode_dense_pallas_full_fold():
    """Through pic.scatter with the boundary fold, all boundary families."""
    rng = np.random.default_rng(7)
    nx, ny, H = 18, 14, 3
    xr = jnp.asarray(rng.uniform(-2.5, 2.5, (nx, ny)), jnp.float32)
    yr = jnp.asarray(rng.uniform(-2.5, 2.5, (nx, ny)), jnp.float32)
    ch = jnp.asarray(rng.uniform(0, 1, (nx, ny, 3)), jnp.float32)
    act = jnp.ones((nx, ny), bool)
    for bx in (Boundary.PERIODIC, Boundary.NONPERIODIC):
        for by in (Boundary.PERIODIC, Boundary.NONPERIODIC,
                   Boundary.TRIPOLAR_NORTH):
            if by == Boundary.TRIPOLAR_NORTH and bx != Boundary.PERIODIC:
                continue
            st = GridStats(nx=nx, ny=ny, bx=bx, by=by)
            S1, _ = pic.scatter(xr, yr, ch, act, st, H, "dense")
            S2, _ = pic.scatter(xr, yr, ch, act, st, H, "dense_pallas",
                                interpret=True)
            np.testing.assert_allclose(np.asarray(S1), np.asarray(S2),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"{bx} {by}")


def test_model_step_with_pallas_scatter():
    from picles_tpu.core import fetch_relations as FR
    from picles_tpu.core.constants import ODESettings
    from picles_tpu.forcing.winds import constant_winds
    from picles_tpu.grids.cartesian import cartesian_box
    from picles_tpu.models.wave_growth_2d import (WaveGrowth2D,
                                                  WaveGrowth2DConfig)

    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    grid = cartesian_box(100e3, 24, 100e3, 24, periodic_boundary=(True, True))
    m1 = WaveGrowth2D(grid, constant_winds(10.0, 5.0), sett,
                      config=WaveGrowth2DConfig(periodic_boundary=True,
                                                scatter_mode="dense"))
    m2 = WaveGrowth2D(grid, constant_winds(10.0, 5.0), sett,
                      config=WaveGrowth2DConfig(periodic_boundary=True,
                                                scatter_mode="dense_pallas",
                                                pallas_interpret=True))
    s1, s2 = m1.init_state(), m2.init_state()
    for _ in range(3):
        s1 = m1.step(s1)
        s2 = m2.step(s2)
    # f32 accumulation-order differences compound through exp/log round-trips
    np.testing.assert_allclose(np.asarray(s1.state), np.asarray(s2.state),
                               rtol=2e-3, atol=1e-9)


@pytest.mark.parametrize("halo", [3, ((0, 3), (0, 3)), ((1, 2), (0, 3)),
                                  ((2, 0), (3, 1))])
def test_core_gather_matches_fold_all_boundaries(halo):
    """The one-pass boundary-folded gather (wrap/zero/ghost input slabs)
    must equal pad-and-fold for every boundary family and asymmetric
    halo, including the tripolar seam's mirrored ghosts."""
    from picles_tpu.ops.pic_pallas import scatter_core_channels_pallas

    rng = np.random.default_rng(3)
    nx, ny = 22, 18
    (xlo, xhi), (ylo, yhi) = pic.normalize_halo(halo)
    xr = jnp.asarray(rng.uniform(-xlo, xhi - 1e-3, (nx, ny)), jnp.float32)
    yr = jnp.asarray(rng.uniform(-ylo, yhi - 1e-3, (nx, ny)), jnp.float32)
    ch = tuple(jnp.asarray(rng.uniform(0, 1, (nx, ny)), jnp.float32)
               for _ in range(3))
    act = jnp.asarray(rng.uniform(0, 1, (nx, ny)) > 0.25)
    for bx in (Boundary.PERIODIC, Boundary.NONPERIODIC):
        for by in (Boundary.PERIODIC, Boundary.NONPERIODIC,
                   Boundary.TRIPOLAR_NORTH):
            if by == Boundary.TRIPOLAR_NORTH and bx != Boundary.PERIODIC:
                continue
            st = GridStats(nx=nx, ny=ny, bx=bx, by=by)
            S1, s1 = pic.scatter(xr, yr, jnp.stack(ch, -1), act, st, halo,
                                 "dense")
            (c0, c1, c2), s2 = scatter_core_channels_pallas(
                xr, yr, ch, act, st, halo, interpret=True)
            np.testing.assert_allclose(
                np.asarray(S1), np.stack([c0, c1, c2], -1), rtol=1e-5,
                atol=1e-6, err_msg=f"{bx} {by} halo={halo}")
            assert int(s1.clamped) == int(s2.clamped)


def test_core_gather_clamps_capacity_violations():
    """Displacements beyond the declared halo are clamped (and counted)
    identically to the XLA dense path, not silently folded further."""
    from picles_tpu.ops.pic_pallas import scatter_core_channels_pallas

    nx, ny = 16, 12
    halo = ((0, 2), (0, 2))
    xr = jnp.full((nx, ny), 2.7, jnp.float32)   # beyond x_hi=2
    yr = jnp.full((nx, ny), -0.4, jnp.float32)  # beyond x_lo=0
    ch = tuple(jnp.ones((nx, ny), jnp.float32) for _ in range(3))
    act = jnp.ones((nx, ny), bool)
    st = GridStats(nx=nx, ny=ny, bx=Boundary.PERIODIC, by=Boundary.PERIODIC)
    S1, s1 = pic.scatter(xr, yr, jnp.stack(ch, -1), act, st, halo, "dense")
    (c0, c1, c2), s2 = scatter_core_channels_pallas(
        xr, yr, ch, act, st, halo, interpret=True)
    np.testing.assert_allclose(np.asarray(S1),
                               np.stack([c0, c1, c2], -1), rtol=1e-5,
                               atol=1e-6)
    assert int(s1.clamped) == int(s2.clamped) == nx * ny


def test_oversized_halo_raises_actionable_error():
    """A y halo beyond the kernel's 64-lane column pad must raise a clear
    ValueError (previously a negative Python slab offset would silently
    wrap and corrupt the deposit)."""
    import pytest

    from picles_tpu.grids.base import Boundary, GridStats
    from picles_tpu.ops.pic_pallas import scatter_core_channels_pallas

    nx, ny = 16, 16
    st = GridStats(nx=nx, ny=ny, bx=Boundary.PERIODIC, by=Boundary.PERIODIC)
    z = jnp.zeros((nx, ny), jnp.float32)
    with pytest.raises(ValueError, match="pad capacity"):
        scatter_core_channels_pallas(z, z, (z, z, z),
                                     jnp.ones((nx, ny), bool), st,
                                     ((0, 3), (0, 70)), interpret=True)


def test_auto_block_x_raises_for_impossible_width():
    """The 16 MB scoped-VMEM hard limit produces an actionable error when
    even an 8-row full-width block cannot fit (explicit-block kernels;
    the advance auto-tiles columns instead, see col_block)."""
    import pytest

    from picles_tpu.ops.pallas_util import auto_block_x

    with pytest.raises(ValueError, match="scoped VMEM"):
        auto_block_x(20_000, 93)
