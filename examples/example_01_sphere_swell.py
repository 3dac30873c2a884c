"""Spherical aquaplanet swell propagation (T03_PIC_sphere_aqua analog):
a swell blob crosses the sphere along great circles with no forcing.

Run:  python examples/example_01_sphere_swell.py [outdir]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import dataclasses
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

import picles_tpu as pt
from picles_tpu.models.state import Particles2D
from picles_tpu.ops.rhs import TermFlags

SMOKE = _os.environ.get("PICLES_SMOKE") == "1"  # see tests/test_examples.py

DT = 1800.0
NX, NY, NSTEP = (31, 21, 6) if SMOKE else (91, 41, 48)
grid = pt.spherical_grid_2d(0.0, 180.0, NX, 0.0, 80.0, NY,
                            periodic_boundary=(True, False))

ws = pt.FetchRelations.MinimalWindsea(1.0, 1.0, DT)
sett = pt.ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                      timestep=DT, total_time=10 * 24 * 3600.0, dt=1.0,
                      dtmin=1e-2, force_dtmin=True)
flags = TermFlags(input=False, dissipation=False, peak_shift=False,
                  direction=False)
# the model flag is False on a MIXED-periodicity grid (periodic lon,
# open lat): the lat-edge ring (mask==3) must be boundary nodes, not
# active interior — same usage as the reference's sphere-aqua test
# (T03_PIC_sphere_aqua.jl:55,171: grid (true, false), model false)
model = pt.WaveGrowth2D(grid, pt.constant_winds(0.0, 0.0), sett, flags=flags,
                        minimal_state=np.array([1e-12, 1e-20]),
                        config=pt.WaveGrowth2DConfig(periodic_boundary=False,
                                                     halo=4))
ms = model.init_state()

# plant an eastward swell blob at 30N
on = np.zeros((grid.nx, grid.ny), bool)
z = np.zeros((grid.nx, grid.ny, 5), np.float32)
z[..., 0] = math.log(0.2)
on[10:16, 14:19] = True
z[..., 1] = 12.0   # eastward 12 m/s
ms = dataclasses.replace(ms, particles=Particles2D.from_z(
    jnp.asarray(z), ms.particles.t, ms.particles.dt, jnp.asarray(on)))

step = jax.jit(model.step)
snaps, times = [], []
for k in range(NSTEP):  # one day (6 steps when smoke-testing)
    ms = step(ms)
    if k % (8 if not SMOKE else 2) == (7 if not SMOKE else 1):
        snaps.append(np.asarray(ms.state))
        times.append(float(ms.time))

e_last = snaps[-1][..., 0]
com_lon = (np.asarray(grid.x)[..., 0][:, None] * e_last).sum() / e_last.sum()
print(f"blob total E: {e_last.sum():.3f}, center lon: {com_lon:.1f} deg, "
      f"failures: {int(ms.metrics.n_failed)}")

if len(sys.argv) > 1:
    from picles_tpu.viz import plotting as V

    V.movie_2d(grid, np.stack(snaps), f"{sys.argv[1]}/sphere_swell.gif",
               times=np.asarray(times))
    print(f"wrote {sys.argv[1]}/sphere_swell.gif")
