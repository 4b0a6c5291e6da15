"""Device-mesh sharding for batched environments.

The reference has no multi-process execution at all (SURVEY §2c: the only
hook is evotorch's Ray ``num_actors``, fixed to 1 at
examples/learning_agents.py:53).  The TPU-native scaling design:

* **env axis (data parallel)** — B independent env states shard over the
  ``env`` mesh axis with ``NamedSharding``; the fused rollout is vmapped and
  jitted, XLA partitions it with zero cross-device traffic except the final
  stats reductions.  This is the primary axis: envs are embarrassingly
  parallel, so scaling efficiency is bounded only by collective-free step
  execution plus one ``psum``-sized reduction per stats readout.
* **host axis** — on multi-host pods the same code runs SPMD via
  ``jax.distributed.initialize``; per-host PRNG streams come from the
  per-env ``fold_in(key, b)`` contract (env index is globally unique), so no
  host-id folding is needed for correctness, and trajectories are identical
  regardless of the mesh layout.
* **space axis (reserved)** — spatial field decomposition with halo exchange
  for very large fields; see die_tpu/ops/pallas_kernels.py.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from die_tpu.core.config import Dynamics
from die_tpu.parallel.rollout import rollout


def env_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    """1-D mesh over all (or the first n) devices for env-batch sharding."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_env_batch(mesh: Mesh, tree, axis: str = "env"):
    """Place a batched pytree (leading axis = env) with batch-sharded layout."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def sharded_rollout_fn(dynamics: Dynamics, policy, mesh: Mesh,
                       num_steps: int, axis: str = "env", t0: int = 0):
    """jit-compiled batched rollout with env-sharded in/out layouts.

    Returns ``run(params, states, pstates, keys) -> RolloutResult`` where all
    batched arguments are sharded over ``axis`` and params are replicated.
    XLA inserts the (only) collectives for the reduced stats.
    """
    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def run(params, states, pstates, keys):
        fn = partial(rollout, dynamics, policy)
        res = jax.vmap(fn, in_axes=(None, 0, 0, 0, None, None))(
            params, states, pstates, keys, num_steps, t0)
        return res

    shardings_in = (replicated, batch_sharding, batch_sharding, batch_sharding)
    return jax.jit(run, in_shardings=shardings_in)


def aggregate_stats(rewards, num_agents):
    """Cross-env stats reduction — the distributed twin of the reference's
    per-step ``info`` dict math (core/env.py:118-126).  Works on sharded
    arrays; XLA lowers the sums to psum-style collectives over the mesh."""
    total_reward = jnp.sum(rewards)
    mean_step_reward = jnp.mean(rewards)
    final_alive = num_agents[..., -1]
    return {
        "total_reward": total_reward,
        "mean_step_reward": mean_step_reward,
        "total_alive_final": jnp.sum(final_alive),
        "min_alive_final": jnp.min(final_alive),
    }
