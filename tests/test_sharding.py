"""Mesh-sharded rollouts on the 8-virtual-device CPU backend: results must be
bitwise identical to the unsharded batched rollout (layout must never change
trajectories)."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.models.gradient import PhysarumPolicy
from die_tpu.models.static import BrownianPolicy
from die_tpu.parallel.mesh import (
    aggregate_stats,
    env_mesh,
    shard_env_batch,
    sharded_rollout_fn,
)
from die_tpu.parallel.rollout import rollout

SIZE = (16, 16)
N = 256
B = 8
STEPS = 6


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def _batch(dyn, policy, seed=5):
    master = jr.PRNGKey(seed)
    env_keys = jax.vmap(lambda b: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_ENV_INIT), b))(jnp.arange(B))
    roll_keys = jax.vmap(lambda b: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_ROLLOUT), b))(jnp.arange(B))
    pol_keys = jax.vmap(lambda b: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_POLICY_INIT), b))(jnp.arange(B))
    states = jax.vmap(lambda k: init_env_state(k, SIZE, dyn, N))(env_keys)
    pstates = jax.vmap(policy.init_state)(pol_keys) \
        if policy.init_state(jr.PRNGKey(0)) is not None else None
    return states, pstates, roll_keys


@pytest.mark.parametrize("policy", [
    BrownianPolicy(move_scale=0.01),
    PhysarumPolicy(max_agents=N, scale=0.01, sense_offset=0.04),
])
def test_sharded_equals_unsharded(policy):
    dyn = Dynamics(init_agent_ratio=0.1)
    states, pstates, keys = _batch(dyn, policy)

    # unsharded reference
    from functools import partial

    fn = partial(rollout, dyn, policy)
    ref = jax.jit(lambda s, p, k: jax.vmap(
        fn, in_axes=(None, 0, 0, 0, None, None))(None, s, p, k, STEPS, 0)
    )(states, pstates, keys)

    # sharded over the 8-device mesh
    mesh = env_mesh()
    states_s = shard_env_batch(mesh, states)
    pstates_s = shard_env_batch(mesh, pstates) if pstates is not None else None
    keys_s = shard_env_batch(mesh, keys)
    run = sharded_rollout_fn(dyn, policy, mesh, STEPS)
    res = run(None, states_s, pstates_s, keys_s)

    assert np.array_equal(np.asarray(res.rewards), np.asarray(ref.rewards))
    assert np.array_equal(np.asarray(res.state.agents),
                          np.asarray(ref.state.agents))
    assert np.array_equal(np.asarray(res.state.medium),
                          np.asarray(ref.state.medium))

    stats = jax.jit(aggregate_stats)(res.rewards, res.num_agents)
    ref_stats = aggregate_stats(np.asarray(ref.rewards),
                                np.asarray(ref.num_agents))
    assert np.asarray(stats["total_alive_final"]) == ref_stats["total_alive_final"]
