"""Fast-engine rollouts: per-backend RNG wrappers + fused scan / eager oracle.

RNG contract: step t draws bits from k_t = fold_in(rollout_key, t) with site
tags TURN=0, PRIO=1, BLOCK=2 — identical streams on both backends.
"""
from __future__ import annotations

import numpy as np

from die_tpu.core.rng import np_fold_in, np_random_bits
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits, fast_step

TAG_TURN = 0
TAG_PRIO = 1
TAG_BLOCK = 2


def np_step_bits(rollout_key: np.ndarray, t: int, shape) -> FastStepBits:
    k_t = np_fold_in(rollout_key, t)
    return FastStepBits(
        turn=np_random_bits(np_fold_in(k_t, TAG_TURN), shape),
        prio=np_random_bits(np_fold_in(k_t, TAG_PRIO), shape),
        block=np_random_bits(np_fold_in(k_t, TAG_BLOCK), shape),
    )


def oracle_fast_rollout(dyn: FastDynamics, state: FastEnvState,
                        rollout_key: np.ndarray, num_steps: int, t0: int = 0):
    """Eager NumPy rollout — the fast engine's executable spec."""
    shape = state.occ.shape
    rewards = np.zeros(num_steps, np.float32)
    nums = np.zeros(num_steps, np.int32)
    for i in range(num_steps):
        bits = np_step_bits(rollout_key, t0 + i, shape)
        state, reward, num = fast_step(dyn, state, bits)
        rewards[i] = reward
        nums[i] = num
    return state, rewards, nums


def jax_step_bits(rollout_key, t, shape) -> FastStepBits:
    import jax.numpy as jnp
    import jax.random as jr

    k_t = jr.fold_in(rollout_key, t)
    return FastStepBits(
        turn=jr.bits(jr.fold_in(k_t, TAG_TURN), shape, jnp.uint32),
        prio=jr.bits(jr.fold_in(k_t, TAG_PRIO), shape, jnp.uint32),
        block=jr.bits(jr.fold_in(k_t, TAG_BLOCK), shape, jnp.uint32),
    )


def fast_rollout(dyn: FastDynamics, state: FastEnvState, rollout_key,
                 num_steps: int, t0: int = 0):
    """Fused scan rollout (jit this; vmap over envs for lockstep batches)."""
    import jax
    import jax.numpy as jnp

    shape = state.occ.shape

    def body(carry, t):
        st = carry
        bits = jax_step_bits(rollout_key, t, shape)
        st, reward, num = fast_step(dyn, st, bits)
        return st, (reward, num)

    state, (rewards, nums) = jax.lax.scan(
        body, state, jnp.arange(t0, t0 + num_steps))
    return state, rewards, nums
