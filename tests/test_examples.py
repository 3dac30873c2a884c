"""Example smoke tests: every ``examples/*.py`` runs in-process on its
shrunken (PICLES_SMOKE=1) configuration, so the documented user surface
(README / MIGRATION code paths) cannot drift silently.

Each example exposes its results as module globals; the smoke run asserts
completion plus finite, physically sane output.  example_03 additionally
self-asserts bit-exact checkpoint resume.
"""

import os
import runpy
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _run(name):
    os.environ["PICLES_SMOKE"] = "1"
    os.environ.setdefault("MPLBACKEND", "Agg")
    argv = sys.argv
    sys.argv = [name]          # no outdir arg -> no plot/GIF side outputs
    try:
        return runpy.run_path(os.path.join(EXAMPLES, name),
                              run_name="example_smoke")
    finally:
        sys.argv = argv
        os.environ.pop("PICLES_SMOKE", None)


def test_example_00_minimal():
    g = _run("example_00_minimal.py")
    states = g["states"]
    assert np.all(np.isfinite(states))
    assert states[-1, ..., 0].mean() > 0          # wave energy grew
    assert g["sim"].n_steps() == len(states) - 1


def test_example_01_sphere_swell():
    g = _run("example_01_sphere_swell.py")
    e_last = g["snaps"][-1][..., 0]
    assert np.all(np.isfinite(e_last))
    assert e_last.sum() > 0                       # blob still carries energy
    assert int(g["ms"].metrics.n_failed) == 0
    # eastward swell: center of mass sits in / east of the seed block
    # (6 smoke steps = 3 h at 12 m/s move the blob only ~1 deg)
    x = np.asarray(g["grid"].x)[:, 0]
    assert x[11] < g["com_lon"] < x[18]


def test_example_02_tripolar_global():
    g = _run("example_02_tripolar_global.py")
    e = g["e"]
    mask = np.asarray(g["grid"].mask)
    assert np.all(np.isfinite(e))
    assert e[mask == 1].max() > 0                 # forced ocean grew waves
    assert e[mask == 0].sum() == pytest.approx(0.0, abs=1e-10)  # land dry


def test_example_03_checkpoint_restart(tmp_path):
    os.environ["PICLES_SMOKE"] = "1"
    os.environ.setdefault("MPLBACKEND", "Agg")
    argv = sys.argv
    sys.argv = ["example_03_checkpoint_restart.py", str(tmp_path)]
    try:
        g = runpy.run_path(
            os.path.join(EXAMPLES, "example_03_checkpoint_restart.py"),
            run_name="example_smoke")
    finally:
        sys.argv = argv
        os.environ.pop("PICLES_SMOKE", None)
    # the example itself asserts bit-exact resume; double-check the outputs
    assert np.array_equal(g["final_a"], g["final_b"])
    assert os.path.exists(os.path.join(str(tmp_path), "leg1.h5"))
    assert os.path.exists(os.path.join(str(tmp_path), "example_03.gif"))


def test_example_05_multiprocess():
    # launcher spawns 2 real OS worker processes (gloo-joined global mesh)
    # and self-asserts the reassembled field vs a single-process run
    g = _run("example_05_multiprocess.py")
    assert np.isfinite(g["field"]).all()
    assert g["n_active"] == 32 * 32
    assert g["field"][..., 0].mean() > 0


def test_example_04_sharded():
    g = _run("example_04_sharded.py")
    states = g["states"]
    assert np.all(np.isfinite(states))
    assert int(g["sim"].state.metrics.n_failed) == 0
    # actually sharded over the virtual mesh
    assert len(g["sim"].state.state.sharding.device_set) == 8
