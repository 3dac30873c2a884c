"""Independent float64 full-step oracle for the 1D model.

The 1D analog of test_full_step_oracle.py: a plain numpy/scipy
transcription of the reference 1D cycle — signed windsea seed -> adaptive
ODE advance (boundary lanes never advance) -> absolute-position CIC
scatter with the SIGN-MERGE rule -> gather/reseed/off remesh — sharing no
code with picles_tpu's compute path.  Reference semantics:

  - 3-var state [lne, cg_x, x] with x in absolute meters
    (ParticleMesh.jl:20-60, particle_waves_v5.jl:584-652),
  - boundary particles ([0, nx-1] when non-periodic) never advance and
    switch off (mapping_1D.jl:100, :139-144),
  - node state (E, m_x) with m_x = E / (2 cg_x), SIGNED
    (core_1D.jl:103-112),
  - 1D merge rule: contributions of equal momentum sign add; the node
    keeps the sign group carrying the larger |m| (ParticleInCell.jl:
    545-613; this framework's documented deterministic sign-partition
    reduction of the order-dependent sequential fold),
  - the 1D e-max guard resets the FULL state to the windsea (unlike the
    2D lne clamp; mapping_1D.jl:147-177).
"""

import math

import numpy as np
from scipy.integrate import solve_ivp

from test_full_step_oracle import (G, LOG_E_MAX, WIND_MIN_SQ,
                                   np_minimal_state, np_windsea)

from picles_tpu.core.constants import (IDConstants, ODEParameters, e_T_func,
                                       magic_fractions)


def _np_rhs_1d(t, z, u, pars, gamma):
    """Float64 transcription of the 1D RHS (particle_waves_v5.jl:584-652):
    no direction terms, alpha (not alpha_p) feeds the windows, dx = cg."""
    cid = IDConstants.create(r_g=pars.r_g)
    p, q, n = magic_fractions(-0.25)
    eT = e_T_func(gamma, p, q, n, c_beta=cid.c_beta, c_D=cid.c_D,
                  c_e=cid.c_e, c_alpha=cid.c_alpha)
    g = G
    lne, cg, x = z
    cgp = abs(cg) / pars.r_g
    kp = g / (4 * max(cgp ** 2, 1e-2))
    wp = g / (2 * max(cgp, 0.1))
    alpha = min(abs(u) / (2 * cgp) if cgp > 0 else 500.0, 500.0)
    Hp = 0.5 * (1 + math.tanh(p * (alpha - 0.85)))
    Dp = 1 - 1.25 / math.cosh(min(abs(10 * (alpha - 0.85)), 300.0)) ** 2
    It = pars.C_e * Hp * alpha ** 2
    Dt = math.exp(n * lne) * (kp / eT) ** (2 * n)
    Scg = pars.C_alpha * Dp * kp ** 4 * math.exp(2 * lne)
    dlne = wp * pars.r_g * Scg + wp * (It - Dt)
    dcg = -cg * wp * pars.r_g * Scg
    return np.array([dlne, dcg, cg])


def np_windsea_1d(u, dt):
    """Signed 1D windsea: get_initial_windsea(u, 0, dt)
    (FetchRelations.jl:254-287)."""
    return np_windsea(u, 0.0, dt)


class Oracle1D:
    def __init__(self, nx, Lx, periodic, u_func, DT):
        self.nx = nx
        self.dx = Lx / (nx - 1)
        self.xs = np.linspace(0.0, Lx, nx)
        self.periodic = periodic
        self.u_func = u_func
        self.DT = DT
        self.pars, self.cid, _ = ODEParameters.create()
        self.min_e, self.min_m2 = np_minimal_state(DT)
        self.boundary = np.zeros(nx, bool)
        if not periodic:
            self.boundary[0] = self.boundary[-1] = True

    def seed(self):
        nx = self.nx
        z = np.zeros((nx, 3))
        on = np.zeros(nx, bool)
        for i in range(nx):
            u = self.u_func(self.xs[i], 0.0)
            ws = np_windsea_1d(u, self.DT)   # all-strong test forcing
            z[i] = [ws["lne"], ws["cg_x"], self.xs[i]]
            on[i] = abs(u) > math.sqrt(2.0)
        return z, on

    def step(self, z, on, t0):
        nx, DT = self.nx, self.DT
        z, on = z.copy(), on.copy()

        # --- advance: on & ~boundary (mapping_1D.jl:100) ---
        for i in range(nx):
            u = self.u_func(self.xs[i], t0)
            if on[i] and not self.boundary[i]:
                sol = solve_ivp(
                    lambda t, zz: _np_rhs_1d(t, zz, u, self.pars,
                                             self.cid.gamma),
                    (t0, t0 + DT), z[i], rtol=1e-8, atol=1e-11,
                    method="RK45")
                z[i] = sol.y[:, -1]
        # on & boundary -> off (mapping_1D.jl:139-144)
        on &= ~self.boundary

        for i in range(nx):
            if self.boundary[i]:
                continue
            u_end = self.u_func(self.xs[i], t0 + DT)
            # off re-light (mapping_1D.jl:122-135)
            if not on[i] and u_end * u_end >= WIND_MIN_SQ:
                ws = np_windsea_1d(u_end, DT)
                z[i] = [ws["lne"], ws["cg_x"], self.xs[i]]
                on[i] = True
            # guards: NaN/Inf/e-max -> FULL windsea reset (1D semantics)
            if (not np.all(np.isfinite(z[i]))) or z[i][0] > LOG_E_MAX:
                ws = np_windsea_1d(u_end, DT)
                z[i] = [ws["lne"], ws["cg_x"], self.xs[i]]

        # --- scatter: absolute-position CIC with the sign-merge rule ---
        S_pos = np.zeros((nx, 2))
        S_neg = np.zeros((nx, 2))
        for i in range(nx):
            if not (on[i] and not self.boundary[i]):
                continue
            lne, cg, x = z[i]
            E = math.exp(lne)
            m = E / (2 * cg)     # signed (core_1D.jl:103-112)
            xn = (x - 0.0) / self.dx
            f = math.floor(xn)
            w = xn - f
            for off, wgt in ((0, 1 - w), (1, w)):
                gi = int(f) + off
                if self.periodic:
                    gi %= nx
                elif not (0 <= gi < nx):
                    continue
                (S_pos if m >= 0 else S_neg)[gi] += [wgt * E, wgt * m]
        take_pos = np.abs(S_pos[:, 1]) >= np.abs(S_neg[:, 1])
        S = np.where(take_pos[:, None], S_pos, S_neg)

        # --- remesh (mapping_1D.jl:221-278), winds at pre-tick clock ---
        for i in range(nx):
            if self.boundary[i]:
                continue
            u_i = self.u_func(self.xs[i], t0)
            E, m = S[i]
            if E >= self.min_e and m * m >= self.min_m2:
                z[i] = [math.log(E), E / (2 * m), self.xs[i]]
                on[i] = True
            elif u_i * u_i >= WIND_MIN_SQ:
                ws = np_windsea_1d(u_i, DT)
                z[i] = [ws["lne"], ws["cg_x"], self.xs[i]]
                on[i] = True
            else:
                on[i] = False
        return z, on, S


def _run_case(periodic):
    import jax
    import jax.numpy as jnp

    from picles_tpu.core import fetch_relations as FR
    from picles_tpu.core.constants import ODESettings
    from picles_tpu.forcing.winds import Winds1D
    from picles_tpu.models.wave_growth_1d import (WaveGrowth1D,
                                                  WaveGrowth1DConfig,
                                                  one_d_grid)

    nx, Lx, DT, U = 8, 200e3, 600.0, 10.0

    def u_o(x, t):
        return U

    winds = Winds1D(u=lambda x, t: jnp.full_like(jnp.asarray(x, jnp.float32),
                                                 U))

    orc = Oracle1D(nx, Lx, periodic, u_o, DT)
    z, on = orc.seed()
    t = 0.0
    states = []
    for _ in range(3):
        z, on, S = orc.step(z, on, t)
        t += DT
        states.append(S.copy())

    ws = FR.MinimalWindsea_1d(U, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True,
                       abstol=1e-7, reltol=1e-6)
    grid = one_d_grid(0.0, Lx, nx, periodic=periodic)
    model = WaveGrowth1D(grid, winds, sett,
                         config=WaveGrowth1DConfig(
                             periodic_boundary=periodic))
    ms = model.init_state()
    step = jax.jit(model.step)
    for k in range(3):
        ms = step(ms)
        got = np.asarray(ms.state)[:, :2]
        np.testing.assert_allclose(got, states[k], rtol=1e-4, atol=1e-9,
                                   err_msg=f"periodic={periodic} step {k+1}")
    np.testing.assert_array_equal(np.asarray(ms.particles.on), on)


def test_full_step_1d_matches_f64_oracle_nonperiodic():
    _run_case(False)


def test_full_step_1d_matches_f64_oracle_periodic():
    _run_case(True)


def test_full_step_1d_merge_rule_opposing_winds():
    """Converging half-domain winds (+U left, -U right): mixed-sign
    momentum deposits collide mid-domain, exercising the sign-merge rule
    (equal-sign contributions add; the larger-|m| group wins the node)
    for real — locked against the oracle's independent implementation."""
    import jax
    import jax.numpy as jnp

    from picles_tpu.core import fetch_relations as FR
    from picles_tpu.core.constants import ODESettings
    from picles_tpu.forcing.winds import Winds1D
    from picles_tpu.models.wave_growth_1d import (WaveGrowth1D,
                                                  WaveGrowth1DConfig,
                                                  one_d_grid)

    nx, Lx, DT, U = 9, 200e3, 600.0, 10.0
    xsplit = Lx / 2

    def u_o(x, t):
        return U if x < xsplit else -U

    winds = Winds1D(u=lambda x, t: jnp.where(jnp.asarray(x) < xsplit,
                                             U, -U).astype(jnp.float32))

    orc = Oracle1D(nx, Lx, False, u_o, DT)
    z, on = orc.seed()
    t = 0.0
    states = []
    for _ in range(4):
        z, on, S = orc.step(z, on, t)
        t += DT
        states.append(S.copy())
    # both momentum signs must actually appear in the field
    assert (states[-1][:, 1] > 0).any() and (states[-1][:, 1] < 0).any()

    ws = FR.MinimalWindsea_1d(U, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True,
                       abstol=1e-7, reltol=1e-6)
    grid = one_d_grid(0.0, Lx, nx, periodic=False)
    model = WaveGrowth1D(grid, winds, sett,
                         config=WaveGrowth1DConfig(periodic_boundary=False))
    ms = model.init_state()
    step = jax.jit(model.step)
    for k in range(4):
        ms = step(ms)
        np.testing.assert_allclose(np.asarray(ms.state)[:, :2], states[k],
                                   rtol=1e-4, atol=1e-9,
                                   err_msg=f"opposing step {k+1}")
    np.testing.assert_array_equal(np.asarray(ms.particles.on), on)
