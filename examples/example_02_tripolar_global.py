"""Global tripolar run with land mask, pole masking, and a zonal-jet wind
(T03_PIC_tripolar analog on the synthetic supergrid; point the loader at a
real MOM6 ocean_hgrid file to run the production grid:

    grid = pt.load_mom6_grid("ocean_hgrid.nc", k=4, mask_file="topo.nc")

Run:  python examples/example_02_tripolar_global.py [outdir]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

import jax
import jax.numpy as jnp
import numpy as np

import picles_tpu as pt

SMOKE = _os.environ.get("PICLES_SMOKE") == "1"  # see tests/test_examples.py

DT = 1200.0
grid = pt.synthetic_tripolar_grid(k=2)
STOP = 2 * DT if SMOKE else 6 * 3600.0

def u(x, y, t):
    return 12.0 * jnp.exp(-(((jnp.asarray(y) - 40.0) / 20.0) ** 2))

def v(x, y, t):
    return jnp.zeros_like(jnp.asarray(x))

winds = pt.Winds2D(u=u, v=v)
ws = pt.FetchRelations.MinimalWindsea(10.0, 10.0, DT)
sett = pt.ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                      timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                      dtmin=1e-4, force_dtmin=True)
model = pt.WaveGrowth2D(grid, winds, sett,
                        config=pt.WaveGrowth2DConfig(periodic_boundary=True))
sim = pt.Simulation.create(model, stop_time=STOP, verbose=True)
sim.run(cash_store=True)

states = sim.store.as_array()
e = states[-1, ..., 0]
mask = np.asarray(grid.mask)
print(f"ocean nodes: {(mask == 1).sum()}, max Hs: {4*np.sqrt(e.max()):.2f} m, "
      f"land energy: {e[mask == 0].sum():.2e}")

if len(sys.argv) > 1:
    from picles_tpu.viz import plotting as V

    V.plot_state_double_globe(grid, states[-1], show_seam=True,
                              path=f"{sys.argv[1]}/tripolar_globes.png")
    print(f"wrote {sys.argv[1]}/tripolar_globes.png")
