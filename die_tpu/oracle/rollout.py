"""Eager NumPy rollout driver for the oracle — mirrors parallel/rollout.py's
RNG threading exactly (k_t = fold_in(rollout_key, t); policy key folds
TAG_POLICY) so full trajectories compare bit-for-bit with the fused scan."""
from __future__ import annotations

import numpy as np

from die_tpu.core import channels as ch
from die_tpu.core.rng import np_fold_in
from die_tpu.oracle.env import (
    OracleState,
    oracle_env_step,
    oracle_observe,
)


def oracle_session_keys(key: np.ndarray):
    """(env_init, policy_init, rollout) keys from a master key."""
    return (np_fold_in(key, ch.TAG_SESSION_ENV_INIT),
            np_fold_in(key, ch.TAG_SESSION_POLICY_INIT),
            np_fold_in(key, ch.TAG_SESSION_ROLLOUT))


def oracle_rollout(dynamics, agent, state: OracleState, rollout_key,
                   num_steps: int, t0: int = 0):
    """Run the policy∘step loop eagerly.  Returns (state, rewards, num_agents).

    ``agent`` carries its own persistent state (oracle agents are stateful
    objects, like the reference's); ``state`` is the env state.
    """
    rewards = np.zeros(num_steps, np.float32)
    num_agents = np.zeros(num_steps, np.int32)
    for i in range(num_steps):
        t = t0 + i
        k_t = np_fold_in(rollout_key, t)
        k_policy = np_fold_in(k_t, ch.TAG_POLICY)
        obs = oracle_observe(dynamics, state)
        action = agent.forward(obs, k_policy)
        state, reward, info = oracle_env_step(dynamics, state, action)
        rewards[i] = reward
        num_agents[i] = info["num_agents"]
    return state, rewards, num_agents
