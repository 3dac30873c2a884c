"""S0x-analog grid unit tests (reference tests/S01_grids_Cartesian.jl,
S02_2D_box_mesh_grid.jl, src/Grids/mask_utils_test.jl:22-31).

The reference's only assert-like checks live in these scripts: grid
construction invariants, mask codes, boundary handling, and the projection
kernel.  Here they are real asserting tests over the Grid2D pytree.
"""

import numpy as np
import pytest

from picles_tpu.grids.base import Boundary
from picles_tpu.grids.cartesian import (cartesian_box, cartesian_grid_2d,
                                        projection_kernel_cartesian)
from picles_tpu.grids.mask import (interior_boundary, make_boundaries,
                                   mask_circle)


class TestCartesianConstruction:
    def test_box_spacing_and_coords(self):
        # reference S01_grids_Cartesian.jl:14-40 / CartesianGrid.jl:104-112
        g = cartesian_box(100e3, 51, 60e3, 31)
        assert (g.nx, g.ny) == (51, 31)
        assert g.stats.dx == pytest.approx(2000.0)
        assert g.stats.dy == pytest.approx(2000.0)
        x = np.asarray(g.x)
        y = np.asarray(g.y)
        assert x[0, 0] == 0.0 and x[-1, 0] == pytest.approx(100e3)
        assert y[0, 0] == 0.0 and y[0, -1] == pytest.approx(60e3)
        # meshgrid ij-indexing: x varies along axis 0, y along axis 1
        assert np.allclose(x[:, 0], x[:, -1])
        assert np.allclose(y[0, :], y[-1, :])
        assert np.allclose(np.asarray(g.area), 2000.0 * 2000.0)

    def test_projection_kernel_unrotated(self):
        # reference CartesianGrid.jl:115-136: M = diag(1/dx, 1/dy)
        M = projection_kernel_cartesian(2000.0, 500.0, 0.0)
        assert np.allclose(M, [[1 / 2000.0, 0.0], [0.0, 1 / 500.0]])
        g = cartesian_box(100e3, 51, 25e3, 51)
        assert np.allclose(np.asarray(g.proj)[7, 9],
                           [[1 / 2000.0, 0.0], [0.0, 1 / 500.0]])

    def test_projection_kernel_rotated(self):
        # rotated grid: TRUE rotation M = [[c/dx, s/dx], [-s/dy, c/dy]]
        # (the reference's symmetric-sin matrix is a documented bug fix —
        # see projection_kernel_cartesian)
        M = projection_kernel_cartesian(1000.0, 1000.0, 30.0)
        c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
        assert np.allclose(M, [[c / 1000.0, s / 1000.0],
                               [-s / 1000.0, c / 1000.0]])
        # a velocity ALONG the rotated i-axis moves purely in grid-i
        v = M @ np.array([c, s])
        assert v[0] > 0 and abs(v[1]) < 1e-12
        # invertible at every angle (the reference form is singular at 45)
        assert abs(np.linalg.det(projection_kernel_cartesian(
            1000.0, 1000.0, 45.0))) > 1e-10

    def test_cartesian_pc_is_zero(self):
        g = cartesian_box(10e3, 11, 10e3, 11)
        assert np.all(np.asarray(g.pc) == 0.0)


class TestMaskCodes:
    def test_nonperiodic_edges_are_grid_boundary(self):
        # reference mask_utils.jl:38-55: non-periodic edges forced to 3
        g = cartesian_box(10e3, 6, 10e3, 5, periodic_boundary=(False, False))
        m = np.asarray(g.mask)
        assert np.all(m[0, :] == 3) and np.all(m[-1, :] == 3)
        assert np.all(m[:, 0] == 3) and np.all(m[:, -1] == 3)
        assert np.all(m[1:-1, 1:-1] == 1)

    def test_periodic_is_all_ocean(self):
        g = cartesian_box(10e3, 6, 10e3, 5, periodic_boundary=(True, True))
        assert np.all(np.asarray(g.mask) == 1)

    def test_mixed_periodicity(self):
        g = cartesian_box(10e3, 6, 10e3, 5, periodic_boundary=(True, False))
        m = np.asarray(g.mask)
        assert np.all(m[:, 0] == 3) and np.all(m[:, -1] == 3)
        assert np.all(m[:, 1:-1] == 1)

    def test_land_boundary_ring(self):
        # land hole in the interior -> its ocean-adjacent land ring is code 2
        mask = np.ones((9, 9), dtype=bool)
        mask[4, 4] = False
        total = make_boundaries(mask, Boundary.PERIODIC, Boundary.PERIODIC)
        assert total[4, 4] == 2  # land node adjacent to ocean
        assert total[3, 3] == 1  # diagonal neighbor stays ocean
        assert np.sum(total == 2) == 1

    def test_interior_boundary_four_neighborhood(self):
        mask = np.ones((7, 7), dtype=bool)
        mask[2:5, 2:5] = False  # 3x3 land block
        b = interior_boundary(mask)
        # edge-of-block land nodes flagged, center not
        assert b[2, 3] and b[3, 2] and b[4, 3] and b[3, 4]
        assert not b[3, 3]
        assert not b[1, 3]  # ocean never flagged

    def test_mask_circle(self):
        # reference mask_utils.jl:106-139
        g = cartesian_box(10e3, 11, 10e3, 11)
        xx, yy = np.asarray(g.x), np.asarray(g.y)
        mask = mask_circle(np.ones((11, 11), dtype=bool), xx, yy, (5, 5),
                           2500.0)
        assert not mask[5, 5]
        assert not mask[5, 7]  # 2 km < 2.5 km radius
        assert mask[5, 8]      # 3 km > radius
        assert mask.sum() < 121


class TestPointMasks:
    def test_ocean_points_periodic_includes_ring(self):
        # reference WaveGrowthModels2D.jl:255-270
        g = cartesian_box(10e3, 6, 10e3, 6, periodic_boundary=(False, False))
        assert int(np.sum(np.asarray(g.ocean_point_mask(True)))) == 36
        assert int(np.sum(np.asarray(g.ocean_point_mask(False)))) == 16

    def test_boundary_points(self):
        # reference core_2D.jl:360-366
        mask = np.ones((6, 6), dtype=bool)
        mask[3, 3] = False
        g = cartesian_grid_2d(0, 10e3, 6, 0, 10e3, 6, mask=mask)
        bp_periodic = np.asarray(g.boundary_point_mask(True))
        bp_nonper = np.asarray(g.boundary_point_mask(False))
        assert bp_periodic[3, 3] and int(bp_periodic.sum()) == 1
        # non-periodic additionally flags the outer ring (code 3)
        assert bp_nonper[0, 0] and bp_nonper[3, 3]
        assert int(bp_nonper.sum()) == 20 + 1

    def test_custom_mask_respected_in_model_masks(self):
        mask = np.ones((8, 8), dtype=bool)
        mask[2:4, 2:4] = False
        g = cartesian_grid_2d(0, 7e3, 8, 0, 7e3, 8, mask=mask,
                              periodic_boundary=(True, True))
        m = np.asarray(g.mask)
        assert np.all(m[2:4, 2:4] == 2)  # whole 2x2 block touches ocean
        ocean = np.asarray(g.ocean_point_mask(True))
        assert not ocean[2, 2] and ocean[1, 2]
