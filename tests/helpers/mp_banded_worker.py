"""Worker for the banded-kernel-under-a-process-spanning-mesh test: each
process's device runs the banded Pallas kernel (interpret mode on CPU) on
its env shard inside one shard_map program, with a cross-process psum of
the per-step rewards — the realistic pod deployment for large fields
(env-parallel over hosts, banded kernel per chip).  Prints exact digests
of the local env's final state plus the global reward vector."""
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

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.pallas_step import pallas_banded_rollout

SIZE = (32, 128)
STEPS = 4
BANDS = 2

dyn = FastDynamics(agents_die=True)
B = nproc
mesh = Mesh(np.array(jax.devices()), ("env",))
field_shard = NamedSharding(mesh, P("env", None, None))
key_shard = NamedSharding(mesh, P("env"))

# host-local slice of the globally-indexed env batch (1 env per process)
st = fast_init_jax(jr.fold_in(jr.PRNGKey(0), pid), SIZE, dyn)
local = jax.tree.map(lambda x: np.asarray(x)[None], st)
fields = {name: jax.make_array_from_process_local_data(
    field_shard, getattr(local, name)) for name in
    ("occ", "dir", "agent_food", "env_food", "chem")}
keys = jax.make_array_from_process_local_data(
    key_shard, np.asarray(jr.fold_in(jr.PRNGKey(1), pid))[None])


def local_roll(occ, dirf, afood, efood, chem, key):
    st = FastEnvState(occ=occ[0], dir=dirf[0], agent_food=afood[0],
                      env_food=efood[0], chem=chem[0],
                      flow_step=jnp.int32(0))
    out, rewards, nums = pallas_banded_rollout(
        dyn, st, key[0], STEPS, num_bands=BANDS, interpret=True)
    greward = jax.lax.psum(rewards, "env")  # crosses the process boundary
    return (out.occ[None], out.dir[None], out.agent_food[None],
            out.env_food[None], out.chem[None], greward, nums[None])


sharded = shard_map(
    local_roll, mesh=mesh,
    in_specs=(P("env", None, None),) * 5 + (P("env"),),
    out_specs=(P("env", None, None),) * 5 + (P(), P("env")),
    check_vma=False)

run = jax.jit(lambda f, k: sharded(
    f["occ"], f["dir"], f["agent_food"], f["env_food"], f["chem"], k))
occ, dirf, afood, efood, chem, grewards, nums = run(fields, keys)


def digest(x):
    bits = np.asarray(x).view(np.uint32)
    with np.errstate(over="ignore"):
        return int(np.add.reduce(bits.reshape(-1), dtype=np.uint32))


# addressable (local) shard of each per-env output = this process's env
local_occ = np.asarray(occ.addressable_shards[0].data)
local_chem = np.asarray(chem.addressable_shards[0].data)
local_afood = np.asarray(afood.addressable_shards[0].data)
print(f"ENVDIGEST {pid}", float(local_occ.sum()), digest(local_chem),
      digest(local_afood), flush=True)
print("GREWARDS", " ".join(f"{v:.6f}" for v in np.asarray(grewards)),
      flush=True)
print("NUMS", " ".join(str(int(v)) for v in
                       np.asarray(nums.addressable_shards[0].data
                                  ).reshape(-1)), flush=True)
