"""Independent float64 full-step oracle.

A plain numpy/scipy implementation of the full model cycle — windsea seed ->
adaptive ODE advance -> CIC scatter -> gather/reseed/off remesh — transcribed
directly from the reference formulas (citations inline), sharing NO code with
picles_tpu's compute path (the RHS transcription `_np_rhs_2d` lives in
test_rhs.py and is itself locked against scipy there).  The framework's
jitted step is then run on the same tiny configurations and must match the
oracle to solver tolerance.  This anchors the golden regression locks
OUTSIDE the code under test (VERDICT r2 item 6).

Oracle per-step semantics (reference run.jl:72-115 + mapping_2D.jl:118-356):
  1. advance every on particle by DT with an independent adaptive RK
     (scipy RK45 at tight tolerance on the float64 RHS transcription),
  2. re-light off particles when wind(t+DT)^2 >= wind_min^2 -> windsea,
  3. e-max clamp (lne capped at log_energy_maximum),
  4. CIC scatter of (E, m_x, m_y) = (e^lne, cg E/2|cg|^2) to the 4
     surrounding nodes; periodic wrap or non-periodic drop,
  5. remesh with winds at the pre-tick clock: gather when the node state
     exceeds MinimalState(2, 2, DT), else reseed when winds are strong,
     else off (NodeToParticle! branch table, mapping_2D.jl:306-353).
"""

import math

import numpy as np
import pytest
from scipy.integrate import solve_ivp

from test_rhs import _np_rhs_2d

from picles_tpu.core.constants import ODEParameters

G = 9.81
WIND_MIN_SQ = 4.0
LOG_E_MAX = math.log(17.0)


# ---------------------------------------------------------------------------
# float64 fetch relations (reference FetchRelations.jl:107-139, 165-203,
# 314-359, 381-415)
# ---------------------------------------------------------------------------

def np_windsea(u, v, dt):
    """get_initial_windsea (FetchRelations.jl:316-359), JONSWAP branch."""
    q_x, A, xi_0x = 0.2748, 22.8013, 2.4097   # Dulov et al. 2020
    U = math.hypot(u, v)
    U = max(U, 0.1)
    tau = G * abs(dt) / U
    X_t = (tau / (A * xi_0x)) ** (1.0 / (1.0 - q_x))
    f_m = 3.5 * (G / U) * X_t ** (-0.33)
    a_j = 0.033 * (f_m * U / G) ** 0.67
    E = 0.31 * G ** 2 * a_j * (f_m * 2 * math.pi) ** (-4)
    f_peak = f_m * G / U
    T_bar = 0.9 / f_peak
    cg_amp = G * T_bar / (4 * math.pi)
    cg_x, cg_y = cg_amp * u / U, cg_amp * v / U
    m_x = (u / U) * E / (2 * cg_amp)
    m_y = (v / U) * E / (2 * cg_amp)
    return dict(E=E, lne=math.log(E), cg_x=cg_x, cg_y=cg_y, m_x=m_x, m_y=m_y)


def np_minimal_windsea(u, v, dt):
    """MinimalWindsea (FetchRelations.jl:381-386): unit wind, same sign."""
    U = math.hypot(u, v) or 1.0
    return np_windsea(u / U, v / U, dt)


def np_minimal_state(dt):
    """MinimalState(2, 2, DT) (FetchRelations.jl:412-415)."""
    ws = np_minimal_windsea(2.0, 2.0, dt)
    return ws["E"], ws["m_x"] ** 2 + ws["m_y"] ** 2


# ---------------------------------------------------------------------------
# float64 mask construction (reference mask_utils.jl:38-55)
# ---------------------------------------------------------------------------

def np_make_mask(ocean, periodic):
    """{0 land, 1 ocean, 2 land-boundary, 3 grid-boundary}.

    Note the reference's "land boundary" is the LAND cells adjacent to
    ocean (interior_boundary marks ``circshift(mask) && !mask``), and
    non-periodic edges are forced to 3 unconditionally."""
    bmask = np.zeros_like(ocean)
    for d in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        bmask |= np.roll(ocean, d, axis=(0, 1)) & ~ocean
    mask = ocean.astype(int) + 2 * bmask.astype(int)
    if not periodic:
        mask[0, :] = mask[-1, :] = 3
        mask[:, 0] = mask[:, -1] = 3
    return mask


# ---------------------------------------------------------------------------
# the oracle step
# ---------------------------------------------------------------------------

class Oracle:
    def __init__(self, nx, ny, Lx, Ly, periodic, u_func, v_func, DT):
        self.nx, self.ny = nx, ny
        self.dx = Lx / (nx - 1)
        self.dy = Ly / (ny - 1)
        self.periodic = periodic
        self.u_func, self.v_func = u_func, v_func
        self.DT = DT
        self.pars, self.cid, _ = ODEParameters.create()
        xs = np.linspace(0.0, Lx, nx)
        ys = np.linspace(0.0, Ly, ny)
        self.X, self.Y = np.meshgrid(xs, ys, indexing="ij")
        # projection: m/s -> cell/s (CartesianGrid.jl:115-136, angle 0)
        self.M = np.array([[1.0 / self.dx, 0.0], [0.0, 1.0 / self.dy]])
        self.min_e, self.min_m2 = np_minimal_state(DT)

    def masks(self, ocean):
        mask = np_make_mask(ocean, self.periodic)
        if self.periodic:
            active = (mask == 1) | (mask == 3)
        else:
            active = mask == 1
        return mask, active

    def seed(self, ocean):
        """SeedParticle (core_2D.jl:434-488): windsea when wind > sqrt(2)."""
        mask, active = self.masks(ocean)
        nx, ny = self.nx, self.ny
        z = np.zeros((nx, ny, 5))
        on = np.zeros((nx, ny), bool)
        S = np.zeros((nx, ny, 3))
        for i in range(nx):
            for j in range(ny):
                u = self.u_func(self.X[i, j], self.Y[i, j], 0.0)
                v = self.v_func(self.X[i, j], self.Y[i, j], 0.0)
                strong = math.hypot(u, v) > math.sqrt(2.0)
                ws = (np_windsea(u, v, self.DT) if strong
                      else np_minimal_windsea(u, v, self.DT))
                z[i, j] = [ws["lne"], ws["cg_x"], ws["cg_y"], 0.0, 0.0]
                on[i, j] = strong and mask[i, j] != 0
                if on[i, j]:
                    E = math.exp(z[i, j, 0])
                    c2 = z[i, j, 1] ** 2 + z[i, j, 2] ** 2
                    S[i, j] = [E, z[i, j, 1] * E / (2 * c2),
                               z[i, j, 2] * E / (2 * c2)]
        return z, on, S, mask, active

    def step(self, z, on, t0, mask, active):
        nx, ny = self.nx, self.ny
        DT = self.DT
        z, on = z.copy(), on.copy()

        # --- advance (mapping_2D.jl:149-243) ---
        for i in range(nx):
            for j in range(ny):
                if not active[i, j]:
                    continue
                xg, yg = self.X[i, j], self.Y[i, j]
                # winds sampled at the fixed node position
                u = self.u_func(xg, yg, t0)
                v = self.v_func(xg, yg, t0)
                if on[i, j]:
                    sol = solve_ivp(
                        lambda t, zz: _np_rhs_2d(t, zz, u, v, self.M, 0.0,
                                                 self.pars,
                                                 gamma=self.cid.gamma),
                        (t0, t0 + DT), z[i, j], rtol=1e-8, atol=1e-11,
                        method="RK45")
                    z[i, j] = sol.y[:, -1]
                else:
                    ue = self.u_func(xg, yg, t0 + DT)
                    ve = self.v_func(xg, yg, t0 + DT)
                    if ue * ue + ve * ve >= WIND_MIN_SQ:  # re-light
                        ws = np_windsea(ue, ve, DT)
                        z[i, j] = [ws["lne"], ws["cg_x"], ws["cg_y"], 0, 0]
                        on[i, j] = True
                if z[i, j, 0] > LOG_E_MAX:                # e-max clamp
                    z[i, j, 0] = LOG_E_MAX

        # --- scatter (ParticleInCell.jl:341-376) ---
        S = np.zeros((nx, ny, 3))
        for i in range(nx):
            for j in range(ny):
                if not (on[i, j] and active[i, j]):
                    continue
                lne, cx, cy, px, py = z[i, j]
                E = math.exp(lne)
                c2 = cx * cx + cy * cy
                charge = np.array([E, cx * E / (2 * c2), cy * E / (2 * c2)])
                fx, fy = math.floor(px), math.floor(py)
                wx, wy = px - fx, py - fy
                for cxo, wxo in ((0, 1 - wx), (1, wx)):
                    for cyo, wyo in ((0, 1 - wy), (1, wy)):
                        gi, gj = i + int(fx) + cxo, j + int(fy) + cyo
                        if self.periodic:
                            gi %= nx
                            gj %= ny
                        elif not (0 <= gi < nx and 0 <= gj < ny):
                            continue
                        S[gi, gj] += wxo * wyo * charge

        # --- remesh (mapping_2D.jl:306-353), winds at pre-tick clock ---
        for i in range(nx):
            for j in range(ny):
                if not active[i, j]:
                    continue
                boundary = (mask[i, j] == 2 if self.periodic
                            else mask[i, j] >= 2)
                E, mx, my = S[i, j]
                u = self.u_func(self.X[i, j], self.Y[i, j], t0)
                v = self.v_func(self.X[i, j], self.Y[i, j], t0)
                if (not boundary and E >= self.min_e
                        and mx * mx + my * my >= self.min_m2):
                    m2 = mx * mx + my * my
                    z[i, j] = [math.log(E), mx * E / (2 * m2),
                               my * E / (2 * m2), 0.0, 0.0]
                    on[i, j] = True
                elif u * u + v * v >= WIND_MIN_SQ:
                    ws = np_windsea(u, v, DT)
                    z[i, j] = [ws["lne"], ws["cg_x"], ws["cg_y"], 0.0, 0.0]
                    on[i, j] = True
                else:
                    on[i, j] = False
        return z, on, S


# ---------------------------------------------------------------------------
# framework-vs-oracle comparisons
# ---------------------------------------------------------------------------

def _framework(nx, ny, Lx, Ly, periodic, winds, ocean=None,
               abstol=1e-7, reltol=1e-6):
    import jax
    import jax.numpy as jnp

    from picles_tpu.core import fetch_relations as FR
    from picles_tpu.core.constants import ODESettings
    from picles_tpu.grids.cartesian import cartesian_box
    from picles_tpu.models.wave_growth_2d import (WaveGrowth2D,
                                                  WaveGrowth2DConfig)

    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    # tight solver tolerances: the comparison then isolates the STRUCTURE
    # of the step (seeding, branch table, transforms, scatter indexing) —
    # measured agreement is ~3e-6 relative (f32 floor); the production
    # tolerances (1e-4/1e-3) add only solver error on top
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True,
                       abstol=abstol, reltol=reltol)
    from picles_tpu.grids.cartesian import cartesian_grid_2d

    if ocean is None:
        grid = cartesian_box(Lx, nx, Ly, ny,
                             periodic_boundary=(periodic, periodic))
    else:
        grid = cartesian_grid_2d(0.0, Lx, nx, 0.0, Ly, ny,
                                 mask=np.asarray(ocean),
                                 periodic_boundary=(periodic, periodic))
    model = WaveGrowth2D(grid, winds, sett,
                         config=WaveGrowth2DConfig(
                             periodic_boundary=periodic))
    return model, jax.jit(model.step)


CASES = {
    "periodic-const": dict(periodic=True, U=10.0, V=5.0, land=False),
    "nonperiodic-const": dict(periodic=False, U=10.0, V=5.0, land=False),
    "periodic-halfdomain": dict(periodic=True, U=10.0, V=0.0, land=False,
                                half=True),
    "periodic-landmask": dict(periodic=True, U=10.0, V=5.0, land=True),
}


@pytest.mark.parametrize("case", sorted(CASES), ids=sorted(CASES))
def test_full_step_matches_f64_oracle(case):
    from picles_tpu.forcing.winds import Winds2D
    import jax.numpy as jnp

    cfg = CASES[case]
    nx = ny = 6
    Lx = Ly = 100e3
    DT = 600.0
    U, V = cfg["U"], cfg["V"]

    if cfg.get("half"):
        xsplit = 50e3

        # oracle winds (python scalars)
        def u_o(x, y, t):
            return U if x < xsplit else 0.0

        def v_o(x, y, t):
            return 0.0

        winds = Winds2D(
            u=lambda x, y, t: jnp.where(jnp.asarray(x) < xsplit, U, 0.0),
            v=lambda x, y, t: jnp.zeros_like(jnp.asarray(x, jnp.float32)))
    else:
        def u_o(x, y, t):
            return U

        def v_o(x, y, t):
            return V

        winds = Winds2D(
            u=lambda x, y, t: jnp.full_like(jnp.asarray(x, jnp.float32), U),
            v=lambda x, y, t: jnp.full_like(jnp.asarray(x, jnp.float32), V))

    ocean = np.ones((nx, ny), bool)
    if cfg["land"]:
        ocean[2, 2] = False

    # ---- oracle ----
    orc = Oracle(nx, ny, Lx, Ly, cfg["periodic"], u_o, v_o, DT)
    z, on, S0, mask, active = orc.seed(ocean)
    t = 0.0
    states = []
    for _ in range(3):
        z, on, S = orc.step(z, on, t, mask, active)
        t += DT
        states.append(S.copy())

    # ---- framework ----
    model, step = _framework(nx, ny, Lx, Ly, cfg["periodic"], winds,
                             ocean=ocean if cfg["land"] else None)
    # oracle and framework must agree on the mask layout
    np.testing.assert_array_equal(np.asarray(model.grid.mask), mask)
    ms = model.init_state()
    for k in range(3):
        ms = step(ms)
        got = np.asarray(ms.state)
        # f32 framework at tight solver tolerance vs f64 oracle: ~3e-6
        # measured; 1e-4 leaves 30x headroom while still catching any
        # structural error (wrong index, branch, transform) instantly
        np.testing.assert_allclose(got, states[k], rtol=1e-4, atol=1e-9,
                                   err_msg=f"{case} step {k + 1}")
    # on/off pattern must match exactly
    np.testing.assert_array_equal(np.asarray(ms.particles.on), on)
