"""Multi-device scaling benchmark (weak + strong) for the sharded step.

On real multi-chip hardware this measures the BASELINE.md north star
(>= 80% grid-points/s efficiency 1 host -> 2 hosts).  Only one TPU chip is
reachable in this environment, so by default it runs on the virtual 8-device
CPU mesh (functional validation + relative-efficiency indication; absolute
CPU numbers are not the headline).

Usage:
  python benchmark/bench_scaling.py            # CPU, 8 virtual devices
  JAX_PLATFORMS=tpu python benchmark/bench_scaling.py   # on a real pod
"""

import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags +
                                   " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bench import build  # noqa: E402
from picles_tpu.parallel.sharded import ShardedWaveGrowth2D, make_mesh  # noqa: E402


def measure(model, stepper, ms, n=20):
    ms2 = stepper(ms, 4)
    jax.block_until_ready(jax.tree.leaves(ms2)[0])
    stepper(ms2, n)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = stepper(ms2, n)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    ndev = len(jax.devices())
    base_n = 128  # per-device tile for weak scaling

    # single device reference
    model = build(base_n, base_n, advance_mode="xla")
    step_n = jax.jit(model.step_n, static_argnums=1)
    t1 = measure(model, lambda m, n: step_n(m, n)[0], model.init_state())
    r1 = base_n * base_n / t1
    print(f"1 device, {base_n}x{base_n}: {t1*1e3:.2f} ms/step, "
          f"{r1/1e6:.2f}M pts/s")

    for nd in [d for d in (2, 4, 8) if d <= ndev]:
        px = int(np.floor(np.sqrt(nd)))
        while nd % px:
            px -= 1
        py = nd // px
        mesh = make_mesh(devices=jax.devices()[:nd], shape=(px, py))
        # weak scaling: grow the grid with the mesh
        model = build(base_n * px, base_n * py, advance_mode="xla")
        sharded = ShardedWaveGrowth2D(model, mesh)
        ms = sharded.shard_state(model.init_state())
        step = jax.jit(sharded.step_n, static_argnums=1)
        t = measure(model, lambda m, n: step(m, n)[0], ms)
        rate = base_n * px * base_n * py / t
        eff = rate / (nd * r1)
        print(f"{nd} devices ({px}x{py}), {base_n*px}x{base_n*py}: "
              f"{t*1e3:.2f} ms/step, {rate/1e6:.2f}M pts/s, "
              f"weak-scaling efficiency {eff*100:.0f}%")

    if jax.default_backend() == "cpu":
        print("NOTE: virtual CPU devices share one physical CPU's cores — "
              "these numbers validate the collective path functionally but "
              "do NOT indicate ICI scaling efficiency; run on a real pod "
              "with --tpu for the BASELINE.md 1->2 host measurement.")


if __name__ == "__main__":
    main()
