"""Fused rollouts: policy∘step under ``lax.scan``, batched with ``vmap``.

The reference's canonical loop (examples/minimal_run.py:22-29) is a Python
for-loop calling ``agent.forward`` then ``env.step``.  Here the pair is fused
into a single jitted scan so a whole episode runs on-device with zero host
round-trips, then vmapped over B independent env states — the framework's
primary scaling axis (SURVEY §2c).

RNG contract: step t uses ``k_t = fold_in(rollout_key, t)``;
``k_policy = fold_in(k_t, TAG_POLICY)`` goes to the policy.  Batched rollouts
give env b the key ``fold_in(rollout_key, b)`` as its per-env rollout key.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.env import env_step, observe
from die_tpu.core.state import EnvState


class RolloutResult(NamedTuple):
    state: EnvState
    pstate: object
    rewards: object      # f32[T] (or [B, T] batched)
    num_agents: object   # i32[T]
    total_reward: object # f32[]


def policy_env_step(dynamics: Dynamics, policy, params, state, pstate, key_t):
    """One fused (observe -> policy -> env) step."""
    obs = observe(dynamics, state)
    k_policy = jr.fold_in(key_t, ch.TAG_POLICY)
    action, pstate = policy.forward(params, pstate, obs, k_policy)
    state, info = env_step(dynamics, state, action)
    return state, pstate, info


def rollout(dynamics: Dynamics, policy, params, state, pstate, key,
            num_steps: int, t0: int = 0) -> RolloutResult:
    """Run ``num_steps`` fused steps from step index ``t0`` (pure, jittable).

    When the dynamics allow it and the policy consumes sensed food, the
    scan carries feed(t)'s gathered food value into sense(t+1) — the two
    gathers share indices, so one mixed (food, occupancy) gather serves
    both, bitwise-identically (core/env.py::env_step_carry; saves ~3 of
    the exact engine's 17 MXU dot passes per step — docs/PERF.md round 3).
    """
    from die_tpu.core.env import env_step_carry, fused_sense_ok

    if fused_sense_ok(dynamics) and getattr(policy, "consumes_sensed_food",
                                            False):
        from die_tpu.core import channels as ch_
        from die_tpu.core.env import agent_cells, gather_field

        W, H = state.medium.shape[-2], state.medium.shape[-1]
        ix, iy = agent_cells(state.agents, (W, H))
        sense0 = gather_field(state.medium[ch_.CH_MED_FOOD], ix, iy)

        def body_fused(carry, t):
            state, pstate, sensed = carry
            key_t = jr.fold_in(key, t)
            obs = observe(dynamics, state)
            k_policy = jr.fold_in(key_t, ch.TAG_POLICY)
            action, pstate = policy.forward(params, pstate, obs, k_policy,
                                            sensed_food=sensed)
            state, info, sensed = env_step_carry(dynamics, state, action)
            return ((state, pstate, sensed),
                    (info.reward, info.num_agents))

        (state, pstate, _), (rewards, num_agents) = jax.lax.scan(
            body_fused, (state, pstate, sense0),
            jnp.arange(num_steps) + t0)
        return RolloutResult(state=state, pstate=pstate, rewards=rewards,
                             num_agents=num_agents,
                             total_reward=jnp.sum(rewards))

    def body(carry, t):
        state, pstate = carry
        key_t = jr.fold_in(key, t)
        state, pstate, info = policy_env_step(
            dynamics, policy, params, state, pstate, key_t)
        return (state, pstate), (info.reward, info.num_agents)

    (state, pstate), (rewards, num_agents) = jax.lax.scan(
        body, (state, pstate), jnp.arange(num_steps) + t0)
    return RolloutResult(state=state, pstate=pstate, rewards=rewards,
                         num_agents=num_agents,
                         total_reward=jnp.sum(rewards))


def jit_rollout(dynamics: Dynamics, policy, num_steps: int, t0: int = 0):
    """jit-compiled single-env rollout closure."""

    @jax.jit
    def run(params, state, pstate, key):
        return rollout(dynamics, policy, params, state, pstate, key,
                       num_steps, t0)

    return run


def batched_rollout(dynamics: Dynamics, policy, params, states, pstates,
                    keys, num_steps: int, t0: int = 0) -> RolloutResult:
    """vmap over B lockstep envs (shared params, per-env state and key)."""
    fn = partial(rollout, dynamics, policy)
    return jax.vmap(fn, in_axes=(None, 0, 0, 0, None, None))(
        params, states, pstates, keys, num_steps, t0)


def batch_keys(key, batch: int):
    """Per-env rollout keys: fold_in(key, b)."""
    return jax.vmap(lambda b: jr.fold_in(key, b))(jnp.arange(batch))
