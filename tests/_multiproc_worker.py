"""Worker for test_multiprocess.py: one of 2 real OS processes stepping a
sharded WaveGrowth2D over a GLOBAL 8-device mesh (4 local CPU devices per
process, jax.distributed.initialize + gloo collectives).

Run: python _multiproc_worker.py <process_id> <port> <out.npz>

Exercises the true multi-host path end-to-end: global mesh construction
from jax.devices(), state placement through the
``make_array_from_callback`` branch of ShardedWaveGrowth2D.shard_state
(device_put cannot target non-addressable devices), and cross-process
ppermute/psum collectives inside the shard_map step.  Each process dumps
its ADDRESSABLE shards (global index + data) for the parent to
reassemble and compare against a single-process run.
"""

import os
import sys

pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from picles_tpu.core import fetch_relations as FR  # noqa: E402
from picles_tpu.core.constants import ODESettings  # noqa: E402
from picles_tpu.forcing.winds import constant_winds  # noqa: E402
from picles_tpu.grids.cartesian import cartesian_box  # noqa: E402
from picles_tpu.models.wave_growth_2d import (WaveGrowth2D,  # noqa: E402
                                              WaveGrowth2DConfig)
from picles_tpu.parallel.sharded import (ShardedWaveGrowth2D,  # noqa: E402
                                         make_mesh)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8            # global
assert len(jax.local_devices()) == 4      # per process

DT = 600.0
ws = FR.MinimalWindsea(10.0, 10.0, DT)
sett = ODESettings(log_energy_minimum=float(ws.lne), saving_step=DT,
                   timestep=DT, total_time=6 * 24 * 3600.0, dt=1e-3,
                   dtmin=1e-4, force_dtmin=True)
grid = cartesian_box(100e3, 32, 100e3, 32, periodic_boundary=(True, True))
model = WaveGrowth2D(grid, constant_winds(10.0, 10.0), sett,
                     config=WaveGrowth2DConfig(periodic_boundary=True))

mesh = make_mesh(shape=(4, 2))            # global 4x2 over both processes
sharded = ShardedWaveGrowth2D(model, mesh)
ms = sharded.init_state()                 # -> make_array_from_callback branch
for _ in range(3):
    ms = sharded.step(ms)
jax.block_until_ready(ms.state)

shards = {}
for i, s in enumerate(ms.state.addressable_shards):
    idx = s.index  # tuple of slices into the global [nx, ny, 3]
    shards[f"data_{i}"] = np.asarray(s.data)
    shards[f"x0_{i}"] = np.array([idx[0].start or 0, idx[1].start or 0])
shards["n_shards"] = np.array(len(ms.state.addressable_shards))
shards["n_active"] = np.array(int(ms.metrics.n_active))  # psum across procs
shards["time"] = np.array(float(ms.time))
np.savez(out_path, **shards)
print(f"worker {pid}: ok", flush=True)
