"""CLI entry point: ``python -m picles_tpu --T 2 --DT 10 --Nx 51 --U10 10``.

Runs a constant-wind 2D box experiment with the reference's flag table
(InputOutput.jl:9-52) and writes an HDF5 state store (the working analog of
the reference's old_structure batch runners)."""

from __future__ import annotations

import sys

import numpy as np

from .core import fetch_relations as FR
from .core.constants import ODEParameters, ODESettings
from .forcing.winds import constant_winds
from .grids.cartesian import cartesian_box
from .models.wave_growth_2d import WaveGrowth2D, WaveGrowth2DConfig
from .simulation.simulation import Simulation
from .utils.cli import arg_settings


def main(argv=None) -> int:
    args = arg_settings().parse_args(argv)
    T = (args.T or 2.0) * 3600.0
    DT = (args.DT or 10.0) * 60.0
    Lx = (args.Lx or 100.0) * 1e3
    Nx = args.Nx or 51
    U10 = args.U10 if args.U10 is not None else 10.0
    out = args.ID or "picles_run"

    pars, cid, _ = ODEParameters.create(r_g=args.r_g0)
    gamma = args.gamma if args.gamma is not None else cid.gamma
    ws_min = FR.MinimalWindsea(U10, U10, DT)
    sett = ODESettings(log_energy_minimum=float(ws_min.lne), saving_step=DT,
                       timestep=DT, total_time=T, dt=1e-3, dtmin=1e-4,
                       force_dtmin=True)
    grid = cartesian_box(Lx, Nx, Lx, Nx,
                         periodic_boundary=(args.periodic, args.periodic))
    model = WaveGrowth2D(grid, constant_winds(U10, U10), sett,
                         ode_params=pars, constants=cid,
                         config=WaveGrowth2DConfig(
                             periodic_boundary=args.periodic))
    sim = Simulation.create(model, stop_time=T, verbose=True)
    sim.initialize()
    sim.init_state_store(out)
    sim.run(store=True)
    sim.store.close()
    print(f"wrote {sim.store.path}; final mean E = "
          f"{float(np.asarray(sim.state.state)[..., 0].mean()):.4e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
