"""Headline benchmark: full particle-push throughput on real TPU hardware.

One particle-push = one full advance (adaptive ODE sub-stepping) + CIC
scatter + remesh cycle for one particle, the same unit as the reference
baseline (~5.0e4 pushes/s on a 4-thread laptop CPU for the 51x51 box,
BASELINE.md).  The benchmark runs the flagship WaveGrowth2D model on a
production-scale periodic box, steady state, scan-fused steps.

Prints exactly one JSON line:
  {"metric": "particle_pushes_per_s", "value": ..., "unit": "pushes/s",
   "vs_baseline": ...}
"""

import json
import sys
import time

BASELINE_PUSHES_PER_S = 5.0e4  # BASELINE.md derived reference throughput


def build(nx, ny, advance_mode="pallas"):
    from picles_tpu.core import fetch_relations as FR
    from picles_tpu.core.constants import ODESettings
    from picles_tpu.forcing.winds import constant_winds
    from picles_tpu.grids.cartesian import cartesian_box
    from picles_tpu.models.wave_growth_2d import (WaveGrowth2D,
                                                  WaveGrowth2DConfig)

    DT = 600.0
    ws = FR.MinimalWindsea(10.0, 10.0, DT)
    sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                       timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                       dtmin=1e-4, force_dtmin=True)
    # keep the reference's 2 km node spacing at every size so the CIC
    # displacement per DT stays within the halo (Courant ~2.4 < 3)
    grid = cartesian_box(2e3 * (nx - 1), nx, 2e3 * (ny - 1), ny,
                         periodic_boundary=(True, True))
    scatter_mode = "dense_pallas" if advance_mode == "pallas" else "dense"
    return WaveGrowth2D(grid, constant_winds(10.0, 10.0), sett,
                        config=WaveGrowth2DConfig(periodic_boundary=True,
                                                  advance_mode=advance_mode,
                                                  scatter_mode=scatter_mode))


def bench_config(nx, ny, n_steps=30, reps=3):
    import jax

    model = build(nx, ny)
    ms = model.init_state()

    step_n = jax.jit(model.step_n, static_argnums=1)

    # spin-up: reach steady-state substep counts + compile
    ms, _ = step_n(ms, 4)
    jax.block_until_ready(ms.state)
    step_n(ms, n_steps)  # compile + warm the measured computation

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = step_n(ms, n_steps)
        jax.block_until_ready(out.state)
        best = min(best, time.perf_counter() - t0)
    pushes = nx * ny * n_steps
    return pushes / best, best / n_steps


def main():
    nx = ny = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    pushes_per_s, s_per_step = bench_config(nx, ny)
    # reference-config number for the log
    small_pps, small_spstep = bench_config(51, 51)
    print(f"[bench] {nx}x{ny}: {pushes_per_s:.3e} pushes/s "
          f"({s_per_step*1e3:.2f} ms/step); 51x51: {small_pps:.3e} pushes/s "
          f"({small_spstep*1e3:.2f} ms/step)", file=sys.stderr)
    print(json.dumps({
        "metric": "particle_pushes_per_s",
        "value": round(pushes_per_s, 1),
        "unit": "pushes/s",
        "vs_baseline": round(pushes_per_s / BASELINE_PUSHES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
