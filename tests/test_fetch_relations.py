"""Fetch-relation golden tests.

Values pinned against an independent float64 numpy transcription of the
reference formulas (src/FetchRelations.jl) — see docstrings in
picles_tpu/core/fetch_relations.py for the file:line map.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from picles_tpu.core import fetch_relations as FR


def _windsea_np(u10, v10, dt):
    """Independent float64 transcription of get_initial_windsea (JONSWAP)."""
    g = 9.81
    uamp = max(math.hypot(u10, v10), 0.1)
    tau = g * abs(dt) / uamp
    xt = (tau / (22.8013 * 2.4097)) ** (1.0 / (1.0 - 0.2748))
    fm = 3.5 * (g / uamp) * xt ** (-0.33)
    aj = 0.033 * (fm * uamp / g) ** 0.67
    E = 0.31 * g ** 2 * aj * (fm * 2 * math.pi) ** (-4)
    fpeak = fm * g / uamp
    tbar = 0.9 / fpeak
    cg = g * tbar / (4 * math.pi)
    return dict(E=E, cg_x=cg * u10 / uamp, cg_y=cg * v10 / uamp, cg=cg,
                f_peak=fpeak, Hs=4 * math.sqrt(E),
                m_x=(u10 / uamp) * E / (2 * cg), m_y=(v10 / uamp) * E / (2 * cg),
                X_tilde=xt)


def test_dulov_roundtrip():
    x = 1e3
    tau = FR.tau_from_X_tilde(x)
    assert np.isclose(float(FR.X_tilde_from_tau(tau)), x, rtol=1e-5)


def test_nondimensionalizations():
    assert np.isclose(float(FR.X_tilde(1e5, 10.0)), 9.81 * 1e5 / 100.0)
    assert np.isclose(float(FR.t_tilde(3600.0, 10.0)), 3600 * 9.81 / 10)
    assert np.isclose(float(FR.E_tilde(0.5, 10.0)), 0.5 * 9.81 ** 2 / 1e4)
    assert np.isclose(float(FR.f_p_tilde(0.1, 10.0)), 0.1 * 10 / 9.81)


@pytest.mark.parametrize("u10,v10", [(10.0, 10.0), (-5.0, 0.0), (0.05, 0.02),
                                     (2.0, 2.0), (0.0, -20.0)])
def test_get_initial_windsea_matches_reference_formulas(u10, v10):
    dt = 600.0
    got = FR.get_initial_windsea(u10, v10, dt)
    want = _windsea_np(u10, v10, dt)
    assert np.isclose(float(got.E), want["E"], rtol=1e-5)
    assert np.isclose(float(got.cg_bar_x), want["cg_x"], rtol=1e-5, atol=1e-8)
    assert np.isclose(float(got.cg_bar_y), want["cg_y"], rtol=1e-5, atol=1e-8)
    assert np.isclose(float(got.f_peak), want["f_peak"], rtol=1e-5)
    assert np.isclose(float(got.m_x), want["m_x"], rtol=1e-5, atol=1e-10)
    assert np.isclose(float(got.m_y), want["m_y"], rtol=1e-5, atol=1e-10)
    assert np.isclose(float(got.lne), math.log(want["E"]), rtol=1e-5)


def test_windsea_pm_type():
    got = FR.get_initial_windsea(10.0, 0.0, 600.0, type="PM")
    fpeak = 0.816 * 9.81 / (2 * math.pi * 10.0)
    hs = 0.0246 * 100.0
    assert np.isclose(float(got.f_peak), fpeak, rtol=1e-5)
    assert np.isclose(float(got.Hs), hs, rtol=1e-5)
    assert np.isclose(float(got.E), (hs / 4) ** 2, rtol=1e-5)


def test_minimal_windsea_unit_speed():
    ws = FR.MinimalWindsea(7.0, 0.0, 600.0)
    want = _windsea_np(1.0, 0.0, 600.0)
    assert np.isclose(float(ws.E), want["E"], rtol=1e-5)
    # direction preserved, magnitude from |U|=1
    ws2 = FR.MinimalWindsea(3.0, 4.0, 600.0)
    assert np.isclose(float(ws2.cg_bar_x) / float(ws2.cg_bar_y), 3.0 / 4.0,
                      rtol=1e-4)


def test_minimal_windsea_zero_wind_gets_positive_sign():
    ws = FR.MinimalWindsea(0.0, 0.0, 600.0)
    assert float(ws.cg_bar_x) > 0 and float(ws.cg_bar_y) > 0


def test_minimal_particle_and_state_shapes():
    mp = FR.MinimalParticle(2.0, 2.0, 600.0)
    ms = FR.MinimalState(2.0, 2.0, 600.0)
    assert mp.shape == (5,)
    assert ms.shape == (2,)
    assert float(mp[3]) == 0.0 and float(mp[4]) == 0.0
    ws = FR.MinimalWindsea(2.0, 2.0, 600.0)
    assert np.isclose(float(ms[0]), float(ws.E))
    assert np.isclose(float(ms[1]), float(ws.m_x) ** 2 + float(ws.m_y) ** 2)


def test_windsea_is_vectorized():
    u = jnp.array([[10.0, 5.0], [0.0, -3.0]])
    v = jnp.zeros_like(u)
    ws = FR.get_initial_windsea(u, v, 600.0)
    assert ws.E.shape == (2, 2)
    want = _windsea_np(5.0, 0.0, 600.0)
    assert np.isclose(float(ws.E[0, 1]), want["E"], rtol=1e-5)


def test_windsea_energy_grows_with_duration_and_wind():
    e1 = float(FR.get_initial_windsea(10.0, 0.0, 600.0).E)
    e2 = float(FR.get_initial_windsea(10.0, 0.0, 6000.0).E)
    e3 = float(FR.get_initial_windsea(20.0, 0.0, 600.0).E)
    assert e2 > e1 and e3 > e1


def test_double_limited_fetch():
    # short duration: duration-limited; long: fetch-limited
    v = float(FR.X_tilde_time_and_fetch(3 * 3600.0, 10.0, 5e3))
    xt_fetch = float(FR.X_tilde(5e3, 10.0))
    assert v <= xt_fetch
