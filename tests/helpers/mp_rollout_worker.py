"""Worker for the multi-process distributed test: env-sharded fast-engine
rollout over a 2-process CPU cluster; prints the full reward matrix."""
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

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.rollout import fast_rollout

SIZE = (16, 16)
B = 4
STEPS = 5

dyn = FastDynamics()
mesh = Mesh(np.array(jax.devices()), ("env",))
batch_shard = NamedSharding(mesh, P("env"))

# build the HOST-LOCAL slice of the globally-indexed batch
per = B // jax.process_count()
my = range(pid * per, (pid + 1) * per)
local_states = [fast_init_jax(jr.fold_in(jr.PRNGKey(0), b), SIZE, dyn)
                for b in my]
local_batch = jax.tree.map(
    lambda *xs: np.stack([np.asarray(x) for x in xs]), *local_states)
states = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(batch_shard, x),
    local_batch)
keys = jax.make_array_from_process_local_data(
    batch_shard,
    np.stack([np.asarray(jr.fold_in(jr.PRNGKey(1), b)) for b in my]))

run = jax.jit(
    jax.vmap(lambda s, k: fast_rollout(dyn, s, k, STEPS)),
    out_shardings=(None, NamedSharding(mesh, P()),
                   NamedSharding(mesh, P())))
_, rewards, nums = run(states, keys)
print("REWARDS", " ".join(f"{v:.6f}" for v in
                          np.asarray(rewards).reshape(-1)), flush=True)
# per-host PRNG stream evidence: the env keys THIS host materialized
# (fold_in(master, global_env_index) — the test asserts hosts' key sets
# are pairwise disjoint and match the global derivation)
local_keys = np.stack([np.asarray(jr.fold_in(jr.PRNGKey(1), b)) for b in my])
print("LOCALKEYS", pid,
      " ".join(f"{int(k[0])}:{int(k[1])}" for k in local_keys), flush=True)
