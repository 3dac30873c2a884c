"""Batched adaptive Tsit5 unit tests (analog of reference T02 single-particle
checks, but asserting instead of plotting)."""

import numpy as np
import jax.numpy as jnp

from picles_tpu.ops.tsit5 import SolverConfig, auto_dt, integrate_to


def _decay_rhs(t, z, aux):
    return -0.5 * z


def _oscillator_rhs(t, z, aux):
    # z = [x, v]; x'' = -x
    return jnp.stack([z[..., 1], -z[..., 0]], axis=-1)


def test_exponential_decay_batched():
    z0 = jnp.array([[1.0], [2.0], [4.0]])
    res = integrate_to(_decay_rhs, z0, jnp.zeros(3), jnp.full(3, 3.0),
                       jnp.full(3, 0.01), None, jnp.array([True] * 3),
                       SolverConfig())
    want = np.array([[1.0], [2.0], [4.0]]) * np.exp(-1.5)
    # solver runs at reltol=1e-3; assert within that tolerance
    np.testing.assert_allclose(np.asarray(res.z), want, rtol=2e-3)
    assert not np.any(np.asarray(res.failed))
    np.testing.assert_allclose(np.asarray(res.t), 3.0, rtol=1e-6)


def test_oscillator_accuracy_and_adaptivity():
    z0 = jnp.array([[1.0, 0.0]])
    res = integrate_to(_oscillator_rhs, z0, jnp.zeros(1),
                       jnp.full(1, 2 * np.pi), jnp.full(1, 1e-3), None,
                       jnp.array([True]), SolverConfig(abstol=1e-6, reltol=1e-6))
    np.testing.assert_allclose(np.asarray(res.z[0]), [1.0, 0.0], atol=2e-4)
    # adaptive: far fewer accepted steps than a dtmin-marching scheme
    assert int(res.naccept[0]) < 200


def test_inactive_lanes_pass_through():
    z0 = jnp.array([[1.0], [1.0]])
    res = integrate_to(_decay_rhs, z0, jnp.zeros(2), jnp.full(2, 2.0),
                       jnp.full(2, 0.1), None,
                       jnp.array([True, False]), SolverConfig())
    assert np.isclose(float(res.z[1, 0]), 1.0)
    assert np.isclose(float(res.t[1]), 0.0)
    assert np.isclose(float(res.z[0, 0]), np.exp(-1.0), rtol=2e-3)


def test_per_lane_t_end():
    """Lanes integrate to different end times (lagged off-particles)."""
    z0 = jnp.ones((2, 1))
    res = integrate_to(_decay_rhs, z0, jnp.array([0.0, 1.0]),
                       jnp.array([2.0, 2.0]), jnp.full(2, 0.1), None,
                       jnp.array([True, True]), SolverConfig())
    np.testing.assert_allclose(float(res.z[0, 0]), np.exp(-1.0), rtol=2e-3)
    np.testing.assert_allclose(float(res.z[1, 0]), np.exp(-0.5), rtol=2e-3)


def test_maxiters_marks_failed():
    res = integrate_to(_decay_rhs, jnp.ones((1, 1)), jnp.zeros(1),
                       jnp.full(1, 1e6), jnp.full(1, 1e-3), None,
                       jnp.array([True]),
                       SolverConfig(maxiters=3))
    assert bool(res.failed[0])


def test_stiffish_problem_with_force_dtmin():
    """A fast transient: force_dtmin keeps the lane alive."""
    def rhs(t, z, aux):
        return -50.0 * (z - jnp.cos(t))

    res = integrate_to(rhs, jnp.zeros((1, 1)), jnp.zeros(1), jnp.full(1, 2.0),
                       jnp.full(1, 1e-3), None, jnp.array([True]),
                       SolverConfig(abstol=1e-4, reltol=1e-3, dtmin=1e-4,
                                    force_dtmin=True))
    # analytic steady response of x' = -50(x - cos t)
    lam = 50.0
    want = (lam ** 2 * np.cos(2.0) + lam * np.sin(2.0)
            - lam ** 2 * np.exp(-lam * 2.0)) / (1 + lam ** 2)
    assert not bool(res.failed[0])
    np.testing.assert_allclose(float(res.z[0, 0]), want, atol=1e-3)


def test_auto_dt_reasonable():
    dt = auto_dt(_decay_rhs, jnp.zeros(1), jnp.ones((1, 1)), None)
    # timescale is 2s; initial dt should be a small fraction of it
    assert 1e-5 < float(dt[0]) < 1.0


def test_dt_persists_and_grows():
    res = integrate_to(_decay_rhs, jnp.ones((1, 1)), jnp.zeros(1),
                       jnp.full(1, 10.0), jnp.full(1, 1e-3), None,
                       jnp.array([True]), SolverConfig())
    assert float(res.dt[0]) > 1e-3  # controller grew the step


def test_bosh3_matches_tsit5_within_tolerance():
    """Bosh3 integrates the same problems to the same error target."""
    z0 = jnp.array([[1.0], [2.0], [4.0]])
    res = integrate_to(_decay_rhs, z0, jnp.zeros(3), jnp.full(3, 3.0),
                       jnp.full(3, 0.01), None, jnp.array([True] * 3),
                       SolverConfig(method="bosh3"))
    want = np.array([[1.0], [2.0], [4.0]]) * np.exp(-1.5)
    # per-substep error control at reltol=1e-3 accumulates to ~1e-2 global
    np.testing.assert_allclose(np.asarray(res.z), want, rtol=1e-2)
    assert not np.any(np.asarray(res.failed))

    osc = integrate_to(_oscillator_rhs, jnp.array([[1.0, 0.0]]), jnp.zeros(1),
                       jnp.full(1, 2 * np.pi), jnp.full(1, 1e-3), None,
                       jnp.array([True]),
                       SolverConfig(abstol=1e-6, reltol=1e-6, method="bosh3"))
    np.testing.assert_allclose(np.asarray(osc.z[0]), [1.0, 0.0], atol=5e-4)


def test_bosh3_fewer_rhs_evals_per_substep():
    """Order-3 embedded pair: larger error per step than Tsit5 at equal dt,
    so the controller takes more substeps — but each costs half the RHS
    evals.  Sanity check that both converge and the controller adapts."""
    res5 = integrate_to(_oscillator_rhs, jnp.array([[1.0, 0.0]]), jnp.zeros(1),
                        jnp.full(1, 2 * np.pi), jnp.full(1, 1e-3), None,
                        jnp.array([True]), SolverConfig(method="tsit5"))
    res3 = integrate_to(_oscillator_rhs, jnp.array([[1.0, 0.0]]), jnp.zeros(1),
                        jnp.full(1, 2 * np.pi), jnp.full(1, 1e-3), None,
                        jnp.array([True]), SolverConfig(method="bosh3"))
    assert not bool(res5.failed[0]) and not bool(res3.failed[0])
    # same per-step error target; global drift stays in the same class
    np.testing.assert_allclose(np.asarray(res3.z[0]), np.asarray(res5.z[0]),
                               atol=2e-2)
    # lower order => more substeps, but each costs 3 RHS evals vs 6
    assert int(res3.naccept[0]) >= int(res5.naccept[0])
