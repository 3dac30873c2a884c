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
    evals (3 fresh vs 6 under FSAL).  RHS evaluations are counted for real
    via a wrapped callable.  On a dt-growth-limited problem (the model's
    steady-state regime: error far under tolerance, substep count set by
    the QMAX growth clamp, similar for both orders) total bosh3 evals must
    be lower.  On an accuracy-limited problem (the oscillator below) the
    lower order legitimately costs MORE total evals — asserted too, so the
    test documents both regimes honestly."""
    from picles_tpu.ops.tsit5 import METHODS

    def run(method, rhs_fn, t_end):
        # integrate_to traces the rhs; count evals at trace time (each
        # traced call site executes once per while_loop iteration, so
        # trace-time call count x loop iterations = total runtime evals)
        calls = {"n": 0}

        def counting_rhs(t, z, aux):
            calls["n"] += 1
            return rhs_fn(t, z, aux)

        z0 = (jnp.array([[1.0, 0.0]]) if rhs_fn is _oscillator_rhs
              else jnp.array([[1.0]]))
        res = integrate_to(counting_rhs, z0, jnp.zeros(1),
                           jnp.full(1, t_end), jnp.full(1, 1e-2), None,
                           jnp.array([True]), SolverConfig(method=method))
        iters = int(res.naccept[0]) + int(res.nreject[0])
        # calls per loop body (len(c) stages + 1 FSAL) plus the initial k1;
        # the traced body runs once per substep attempt
        per_body = calls["n"] - 1
        assert per_body == len(METHODS[method].c) + 1, (method, per_body)
        return res, 1 + per_body * iters

    # dt-growth-limited regime (smooth decay): bosh3 wins on total evals
    dec5, devals5 = run("tsit5", _decay_rhs, 3.0)
    dec3, devals3 = run("bosh3", _decay_rhs, 3.0)
    assert not bool(dec5.failed[0]) and not bool(dec3.failed[0])
    np.testing.assert_allclose(np.asarray(dec3.z[0]), np.asarray(dec5.z[0]),
                               rtol=1e-2)
    assert devals3 < devals5, (devals3, devals5)

    # accuracy-limited regime (oscillator): the lower order takes enough
    # extra substeps that its cheap stages do NOT pay off
    res5, evals5 = run("tsit5", _oscillator_rhs, 2 * np.pi)
    res3, evals3 = run("bosh3", _oscillator_rhs, 2 * np.pi)
    assert not bool(res5.failed[0]) and not bool(res3.failed[0])
    np.testing.assert_allclose(np.asarray(res3.z[0]), np.asarray(res5.z[0]),
                               atol=2e-2)
    assert int(res3.naccept[0]) >= int(res5.naccept[0])
    assert evals3 > evals5, (evals3, evals5)


def test_fixed_substep_mode():
    """adaptive=False (reference ODESettings.adaptive, core_2D.jl:185):
    fixed sub-steps of the carried dt, every step accepted, dt unchanged."""
    z0 = jnp.array([[1.0], [2.0]])
    res = integrate_to(_decay_rhs, z0, jnp.zeros(2), jnp.full(2, 3.0),
                       jnp.full(2, 0.5), None, jnp.array([True, True]),
                       SolverConfig(adaptive=False))
    # exactly ceil(3.0 / 0.5) = 6 accepted steps, none rejected
    np.testing.assert_array_equal(np.asarray(res.naccept), [6, 6])
    np.testing.assert_array_equal(np.asarray(res.nreject), [0, 0])
    # dt carried unchanged (no controller)
    np.testing.assert_allclose(np.asarray(res.dt), 0.5)
    assert not np.any(np.asarray(res.failed))
    # 5th-order fixed-step accuracy at dt=0.5 on exp decay: ~1e-6 global
    want = np.array([[1.0], [2.0]]) * np.exp(-1.5)
    np.testing.assert_allclose(np.asarray(res.z), want, rtol=1e-6)


def test_fixed_substep_partial_last_step():
    """t_end not a multiple of dt: the last sub-step is clipped to land
    exactly on t_end (reference step!(integ, DT, true) semantics)."""
    res = integrate_to(_decay_rhs, jnp.ones((1, 1)), jnp.zeros(1),
                       jnp.full(1, 1.3), jnp.full(1, 0.5), None,
                       jnp.array([True]), SolverConfig(adaptive=False))
    assert int(res.naccept[0]) == 3          # 0.5 + 0.5 + 0.3
    np.testing.assert_allclose(float(res.t[0]), 1.3, rtol=1e-7)
    np.testing.assert_allclose(float(res.z[0, 0]), np.exp(-0.65), rtol=1e-6)


def test_fixed_substep_deterministic_across_batch_shapes():
    """The fixed-substep path takes the same substep sequence regardless of
    batching — the property the tight sharded comparisons build on."""
    z0 = jnp.linspace(1.0, 2.0, 12).reshape(12, 1)
    full = integrate_to(_decay_rhs, z0, jnp.zeros(12), jnp.full(12, 2.0),
                        jnp.full(12, 0.25), None, jnp.ones(12, bool),
                        SolverConfig(adaptive=False))
    parts = [integrate_to(_decay_rhs, z0[i:i + 4], jnp.zeros(4),
                          jnp.full(4, 2.0), jnp.full(4, 0.25), None,
                          jnp.ones(4, bool), SolverConfig(adaptive=False))
             for i in (0, 4, 8)]
    np.testing.assert_array_equal(
        np.asarray(full.z), np.concatenate([np.asarray(p.z) for p in parts]))


def test_force_dtmin_advances_f32_clock_at_large_model_time():
    """A forced-dtmin substep must advance the clock even when dtmin falls
    below ulp(t): at t ~ 5e5 s (any multi-day f32 run) ulp(t) ~ 0.06 s >>
    dtmin=1e-4, so an un-guarded `t + dtmin` rounds back to t and the lane
    mutates z at a frozen clock until maxiters, then reads as failed.  The
    spacing-aware floor (max(dtmin, 4 ulp(t))) keeps forced steps moving."""
    t0v = 524288.0                       # 2^19 s: ulp(t) = 0.0625 in f32

    def wiggle_rhs(t, z, aux):
        return jnp.cos(t - t0v) * jnp.ones_like(z)

    # impossible tolerances force every error-controlled step to reject,
    # leaving only forced-dtmin accepts — the pathological regime
    cfg = SolverConfig(abstol=1e-13, reltol=1e-13, dtmin=1e-4,
                       force_dtmin=True, method="bosh3")
    DT = 60.0
    z0 = jnp.zeros((2, 2), jnp.float32)
    res = integrate_to(wiggle_rhs, z0, jnp.full(2, t0v, jnp.float32),
                       jnp.full(2, t0v + DT, jnp.float32),
                       jnp.full(2, 1e-3, jnp.float32), None,
                       jnp.array([True, True]), cfg)
    assert not np.any(np.asarray(res.failed))          # no maxiters spin
    np.testing.assert_allclose(np.asarray(res.t), t0v + DT, rtol=1e-6)
    # forced steps at the ~4*ulp floor: ~DT / 0.25 accepted steps, far
    # below maxiters (an un-guarded floor would burn all 10k iterations)
    assert 100 < int(res.naccept[0]) < 2000
    assert np.all(np.isfinite(np.asarray(res.z)))
