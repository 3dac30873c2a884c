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


# ---------------------------------------------------------------------------
# legacy JONSWAP/PM helpers (reference FetchRelations.jl:457-623)
# ---------------------------------------------------------------------------

def test_legacy_fetch_frequency_roundtrip():
    # X_tilde_j_U_freq inverts f_m_from_X_tilde up to the 0.33-vs-1/3
    # exponent difference of the reference formulas
    u10, xt = 12.0, 3e3
    fm = float(FR.f_m_from_X_tilde(u10, xt))
    xt_back = float(FR.X_tilde_j_U_freq(u10, fm))
    assert np.isclose(xt_back, xt, rtol=0.05)
    # dimensional version scales by U10^2/g
    assert np.isclose(float(FR.X_j_U_freq(u10, fm)),
                      xt_back * u10 ** 2 / 9.81, rtol=1e-6)


def test_legacy_tau_fetch_roundtrip():
    # tau_j inverts X_tilde_j_U_tau exactly
    u10, tau = 10.0, 6 * 3600.0
    xt = float(FR.X_tilde_j_U_tau(u10, tau))
    X = xt * u10 ** 2 / 9.81
    assert np.isclose(float(FR.tau_j(u10, X)), tau, rtol=1e-6)


def test_legacy_f_m_given_U_tau():
    # pinned against the reference formula with its 1.035 adjustment
    u10, tau = 10.0, 6 * 3600.0
    xt = (9.81 * tau / (14 * math.pi * u10)) ** 1.5
    expected = 3.5 * (9.81 / u10) * xt ** (-1.0 / 3.0) * 1.035
    assert np.isclose(float(FR.f_m_given_U_tau(u10, tau)), expected, rtol=1e-6)
    assert np.isclose(float(FR.c_g_U_tau(u10, tau)),
                      9.81 / (4 * math.pi * expected), rtol=1e-6)


def test_legacy_E_j_consistent_with_E_JONSWAP():
    u10, tau = 10.0, 6 * 3600.0
    fm = float(FR.f_m_given_U_tau(u10, tau))
    aj = 0.033 * (fm * u10 / 9.81) ** 0.67
    expected = 0.31 * 9.81 ** 2 * aj * (fm * 2 * math.pi) ** (-4)
    assert np.isclose(float(FR.E_j(u10, tau)), expected, rtol=1e-6)


def test_jonswap_spectrum_shape():
    u10 = 10.0
    fp = 0.12
    f = np.linspace(0.5 * fp, 4 * fp, 400)
    S = np.asarray(FR.JONSWAP_frequency(u10, fp, f))
    assert np.all(S >= 0) and np.all(np.isfinite(S))
    # spectral peak sits at (or just above) the prescribed peak frequency
    f_at_max = f[np.argmax(S)]
    assert abs(f_at_max - fp) / fp < 0.1
    # high-frequency tail decays
    assert S[-1] < 0.05 * S.max()


def test_pm_spectrum_peak_near_PM_f_peak():
    u10 = 10.0
    f = np.linspace(0.02, 1.0, 2000)
    S = np.asarray(FR.PMSpectrum(u10, f))
    assert np.all(np.isfinite(S)) and np.all(S >= 0)
    f_at_max = f[np.argmax(S)]
    wp_over_2pi = 0.879 * 9.81 / u10 / (2 * math.pi)
    assert abs(f_at_max - wp_over_2pi) / wp_over_2pi < 0.15
