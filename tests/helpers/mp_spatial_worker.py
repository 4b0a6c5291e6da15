"""Worker for the multi-process SPATIAL test: the field itself is sharded
over a 2-process CPU cluster (rows split across processes, ring ppermute
halo exchange crossing the process boundary, wave flow active); prints
exact on-device digests of the final state."""
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
import jax.numpy as jnp
import jax.random as jr
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from die_tpu.core.config import FlowConfig
from die_tpu.core.rng import np_key
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_np
from die_tpu.parallel.spatial import spatial_fast_rollout

SIZE = (32, 32)
STEPS = 4

dyn = FastDynamics(flow=FlowConfig(kind="wave"))
mesh = Mesh(np.array(jax.devices()), ("space",))

# every process computes the full init (deterministic NumPy oracle init),
# then contributes the rows its device owns
full = fast_init_np(np_key(3), SIZE, dyn)
row_shard = NamedSharding(mesh, P("space", None))
per = SIZE[0] // nproc
mine = slice(pid * per, (pid + 1) * per)

state = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(
        row_shard, np.asarray(x)[mine])
    if np.asarray(x).ndim == 2
    else jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(x)), full)


def digest(chem):
    # wraparound u32 sum of the bit patterns: exact, order-independent
    # (XLA:CPU lacks a u32 xor reduction)
    bits = jax.lax.bitcast_convert_type(chem, jnp.uint32)
    return jnp.sum(bits)


@jax.jit
def run(s):
    out, rewards, nums = spatial_fast_rollout(dyn, mesh, s, jr.PRNGKey(9),
                                              STEPS)
    return (nums, jnp.sum(out.occ), digest(out.chem), digest(out.env_food),
            digest(out.agent_food))


nums, occ_sum, chem_d, food_d, afood_d = run(state)
print("NUMS", " ".join(str(int(v)) for v in np.asarray(nums)), flush=True)
print("DIGEST", float(occ_sum), int(chem_d), int(food_d), int(afood_d),
      flush=True)
