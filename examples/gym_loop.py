"""The reference's public loop (examples/minimal_run.py:14-29) on the
gym-compatible wrapper: reset -> forward -> step 5-tuple, with a real seed.

Usage: python examples/gym_loop.py [--size 32] [--iters 50] [--seed 7]
"""
import argparse
import sys

sys.path.insert(0, ".")  # noqa: E402  (PYTHONPATH breaks the axon plugin)

import os

import numpy as np
import jax

if os.environ.get("DIE_TPU_CPU"):  # force CPU (env var alone is too late)
    jax.config.update("jax_platforms", "cpu")

import jax.random as jr

from die_tpu.core.config import Dynamics
from die_tpu.core.gym_env import GymEnv
from die_tpu.models.gradient import PhysarumPolicy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    size = (args.size, args.size)
    env = GymEnv(size, Dynamics(init_agent_ratio=0.1), seed=args.seed)
    policy = PhysarumPolicy(max_agents=size[0] * size[1], scale=0.007,
                            turn_angle=30, sense_offset=0.04)
    pstate = policy.init_state(jr.PRNGKey(args.seed + 1))
    pkey = jr.PRNGKey(args.seed + 2)
    # jit the policy — eager per-op dispatch is pathological over the
    # axon tunnel (CLAUDE.md)
    forward = jax.jit(lambda ps, obs, k: policy.forward(None, ps, obs, k))

    obs, _ = env.reset(seed=args.seed)
    total = 0.0
    for t in range(args.iters):
        action, pstate = forward(pstate, obs, jr.fold_in(pkey, t))
        obs, reward, terminated, truncated, info = env.step(action)
        total += reward
        if terminated:
            break
    print(f"total reward: {np.round(total, 3)}  "
          f"agents: {info['num_agents']}  steps: {t + 1}")


if __name__ == "__main__":
    main()
