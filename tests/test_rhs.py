"""RHS golden tests: jnp implementation vs an independent float64 numpy
transcription of reference particle_waves_v5.jl:479-558 (2D) / :584-652 (1D),
plus integration parity against scipy's adaptive RK45."""

import math

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from picles_tpu.core.constants import (IDConstants, ODEParameters, e_T_func,
                                       magic_fractions)
from picles_tpu.ops import rhs as RHS


def _np_rhs_2d(t, z, u10, v10, M, pc, pars, gamma=None):
    """Independent float64 transcription of the in-place reference RHS."""
    cid = IDConstants.create(r_g=pars.r_g)
    gamma = cid.gamma if gamma is None else gamma
    p, q, n = magic_fractions(-0.25)
    eT = e_T_func(gamma, p, q, n, c_beta=cid.c_beta, c_D=cid.c_D,
                  c_e=cid.c_e, c_alpha=cid.c_alpha)
    g = 9.81
    lne, cx, cy, x, y = z
    u, v = u10, v10
    cbar = math.hypot(cx, cy)
    uspeed = math.hypot(u, v)
    cgp = cbar / pars.r_g
    kp = g / (4 * max(cgp ** 2, 1e-2))
    wp = g / (2 * max(abs(cgp), 0.1))
    cgpx, cgpy = cx / pars.r_g, cy / pars.r_g
    alpha = min(uspeed / (2 * cgp) if cgp > 0 else 500.0, 500.0)
    ap = (u * cgpx + v * cgpy) / (2 * max(math.hypot(cgpx, cgpy), 1e-4) ** 2)
    Hp = 0.5 * (1 + math.tanh(p * (ap - 0.85)))
    sech_arg = min(abs(10 * (ap - 0.85)), 300.0)
    Dp = 1 - 1.25 / math.cosh(sech_arg) ** 2
    It = pars.C_e * Hp * alpha ** 2
    Dt = math.exp(n * lne) * (kp / eT) ** (2 * n)
    Scg = pars.C_alpha * Dp * kp ** 4 * math.exp(2 * lne)
    den = uspeed * math.hypot(cgpx, cgpy)
    if den == 0:
        s2 = 0.0
    else:
        s2 = (2 / den ** 2) * (u * v * (2 * cgpy ** 2 - (cgpx**2 + cgpy**2))
                               - cgpx * cgpy * (2 * v ** 2 - uspeed ** 2))
    a2 = min(uspeed / (2 * math.hypot(cgpx, cgpy)) if math.hypot(cgpx, cgpy) > 0 else 500.0, 500.0)
    Sdir = a2 ** 2 * pars.C_varphi * Hp * s2
    Ssp = pc * cx
    dlne = wp * pars.r_g * Scg + wp * (It - Dt)
    dcx = -cx * wp * pars.r_g * Scg + cy * Sdir + cy * Ssp
    dcy = -cy * wp * pars.r_g * Scg - cx * Sdir - cx * Ssp
    dx = M[0, 0] * cx + M[0, 1] * cy
    dy = M[1, 0] * cx + M[1, 1] * cy
    return np.array([dlne, dcx, dcy, dx, dy])


def _make_rhs(u10=10.0, v10=5.0):
    pars, cid, _ = ODEParameters.create(r_g=0.85)
    f = RHS.particle_equations(lambda x, y, t: u10, lambda x, y, t: v10,
                               gamma=cid.gamma, params=pars, constants=cid)
    return f, pars, cid


@pytest.mark.parametrize("z", [
    [math.log(0.002), 1.0, 0.5, 0.0, 0.0],
    [math.log(0.03), 3.0, -2.0, 0.1, -0.2],
    [-11.0, 1e-3, 0.0, 0.0, 0.0],
    [math.log(1.5), 8.0, 8.0, 0.5, 0.5],
])
def test_rhs_2d_matches_reference_formulas(z):
    u10, v10 = 10.0, 5.0
    f, pars, cid = _make_rhs(u10, v10)
    M = np.array([[1 / 2000.0, 0.0], [0.0, 1 / 2000.0]])
    aux = RHS.RHSParams(x=jnp.array(0.0), y=jnp.array(0.0),
                        M=jnp.array(M), pc=jnp.array(0.0))
    got = np.asarray(f(jnp.array(0.0), jnp.array(z, dtype=jnp.float32), aux))
    want = _np_rhs_2d(0.0, z, u10, v10, M, 0.0, pars, gamma=cid.gamma)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-9)


def test_rhs_2d_zero_velocity_is_finite():
    f, pars, cid = _make_rhs()
    aux = RHS.RHSParams(x=jnp.array(0.0), y=jnp.array(0.0),
                        M=jnp.eye(2), pc=jnp.array(0.0))
    dz = f(0.0, jnp.array([-11.0, 0.0, 0.0, 0.0, 0.0]), aux)
    assert np.all(np.isfinite(np.asarray(dz)))


def test_rhs_2d_batched_equals_scalar():
    f, pars, cid = _make_rhs()
    zs = jnp.array([[math.log(0.002), 1.0, 0.5, 0.0, 0.0],
                    [math.log(0.03), 3.0, -2.0, 0.1, -0.2]])
    aux = RHS.RHSParams(x=jnp.zeros(2), y=jnp.zeros(2),
                        M=jnp.broadcast_to(jnp.eye(2), (2, 2, 2)),
                        pc=jnp.zeros(2))
    batch = np.asarray(f(jnp.zeros(2), zs, aux))
    for i in range(2):
        aux1 = RHS.RHSParams(x=jnp.array(0.0), y=jnp.array(0.0),
                             M=jnp.eye(2), pc=jnp.array(0.0))
        single = np.asarray(f(jnp.array(0.0), zs[i], aux1))
        np.testing.assert_allclose(batch[i], single, rtol=1e-6)


def test_rhs_term_flags_disable_sources():
    pars, cid, _ = ODEParameters.create()
    aux = RHS.RHSParams(x=jnp.array(0.0), y=jnp.array(0.0),
                        M=jnp.eye(2), pc=jnp.array(0.0))
    z = jnp.array([math.log(0.002), 1.0, 0.5, 0.0, 0.0])
    f_off = RHS.particle_equations(
        lambda x, y, t: 10.0, lambda x, y, t: 0.0, gamma=cid.gamma,
        params=pars, constants=cid,
        flags=RHS.TermFlags(input=False, dissipation=False, peak_shift=False,
                            direction=False))
    dz = np.asarray(f_off(0.0, z, aux))
    np.testing.assert_allclose(dz[:3], 0.0, atol=1e-12)
    np.testing.assert_allclose(dz[3], 1.0, rtol=1e-6)  # M=I -> dx=cg_x
    np.testing.assert_allclose(dz[4], 0.5, rtol=1e-6)


def test_rhs_1d_matches_2d_x_direction_energy():
    """1D RHS with wind along x should give the same dlne as 2D with v=0,
    cy=0 (direction terms vanish; alpha_p == alpha for aligned wind)."""
    pars, cid, _ = ODEParameters.create()
    f2, _, _ = _make_rhs(10.0, 0.0)
    f1 = RHS.particle_equations_1d(lambda x, t: 10.0, gamma=cid.gamma,
                                   params=pars, constants=cid)
    z2 = jnp.array([math.log(0.002), 2.0, 0.0, 0.0, 0.0])
    z1 = jnp.array([math.log(0.002), 2.0, 0.0])
    aux2 = RHS.RHSParams(x=jnp.array(0.0), y=jnp.array(0.0),
                         M=jnp.eye(2), pc=jnp.array(0.0))
    aux1 = RHS.RHSParams(x=jnp.array(0.0), y=jnp.array(0.0),
                         M=jnp.eye(2), pc=jnp.array(0.0))
    d2 = np.asarray(f2(0.0, z2, aux2))
    d1 = np.asarray(f1(0.0, z1, aux1))
    np.testing.assert_allclose(d1[0], d2[0], rtol=1e-5)
    np.testing.assert_allclose(d1[1], d2[1], rtol=1e-5)
    np.testing.assert_allclose(d1[2], 2.0, rtol=1e-6)  # dx = cg_x in meters


def test_rhs_integration_vs_scipy():
    """Integrate one particle for 10 min and compare with scipy RK45 at
    tight tolerance on the float64 transcription (T02 analog)."""
    u10, v10 = 10.0, 5.0
    f, pars, cid = _make_rhs(u10, v10)
    M = np.eye(2) / 2000.0
    z0 = np.array([math.log(0.002), 1.0, 0.5, 0.0, 0.0])

    sol = solve_ivp(lambda t, z: _np_rhs_2d(t, z, u10, v10, M, 0.0, pars,
                                            gamma=cid.gamma),
                    (0.0, 600.0), z0, rtol=1e-9, atol=1e-12, method="RK45")
    want = sol.y[:, -1]

    from picles_tpu.ops.tsit5 import SolverConfig, integrate_to
    aux = RHS.RHSParams(x=jnp.zeros(1), y=jnp.zeros(1),
                        M=jnp.broadcast_to(jnp.array(M), (1, 2, 2)),
                        pc=jnp.zeros(1))
    res = integrate_to(f, jnp.array(z0, dtype=jnp.float32)[None, :],
                       jnp.zeros(1), jnp.full((1,), 600.0),
                       jnp.full((1,), 1e-3), aux, jnp.array([True]),
                       SolverConfig(abstol=1e-6, reltol=1e-6))
    got = np.asarray(res.z[0])
    assert not bool(res.failed[0])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-6)
