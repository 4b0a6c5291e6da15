"""Worker for the multi-process ES test: lattice-policy PGPE training with
the population sharded over a 2-process CPU cluster (one device per
process).  Prints the training history and a bitwise digest of the final
ES center; both processes must agree, and the test compares them against
the unsharded single-process run (the population-sharding contract:
bitwise-identical training across mesh sizes AND process counts)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np
from jax.sharding import Mesh

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.learned import LatticeTrainConfig, train_lattice

dyn = FastDynamics(food_infinite=True)
cfg = LatticeTrainConfig(field_size=(16, 16), epochs=3, epoch_iters=4,
                         popsize=8, envs_per_eval=1, seed=3)
mesh = Mesh(np.array(jax.devices()), ("pop",))  # 2 devices, 1 per process
best, es_state, history = train_lattice(dyn, cfg, mesh=mesh)

center_bits = np.asarray(es_state.center, np.float32).view(np.uint32)
with np.errstate(over="ignore"):
    digest = int(np.add.reduce(center_bits.reshape(-1), dtype=np.uint32))
print("HISTORY", " ".join(f"{h['best']:.6f}" for h in history), flush=True)
print("CENTER_DIGEST", digest, flush=True)
print("BEST", " ".join(f"{v:.6f}" for v in
                       np.asarray(best).reshape(-1)), flush=True)
