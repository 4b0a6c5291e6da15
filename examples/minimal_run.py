"""Minimal env+agent loop — twin of examples/minimal_run.py:14-42.

The visible loop granularity is preserved (act, step, draw, tqdm postfix)
but each iteration is one fused jitted policy∘step call; pass --chunk to scan
multiple steps per host round-trip.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import numpy as np
import jax
import jax.random as jr
from jax.numpy import int32 as jnp_int32

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.models.gradient import PhysarumPolicy
from die_tpu.models.static import BrownianPolicy
from die_tpu.parallel.rollout import rollout
from die_tpu.render.renderer import EnvRenderer


def run_minimal(policy, agent_ratio=0.1, field_size=(256, 256), iters=1000,
                chunk=1, plot=False, seed=0, max_agents=None):
    dyn = Dynamics(init_agent_ratio=agent_ratio)
    master = jr.PRNGKey(seed)
    state = init_env_state(jr.fold_in(master, ch.TAG_SESSION_ENV_INIT),
                           field_size, dyn, max_agents)
    pstate = policy.init_state(jr.fold_in(master, ch.TAG_SESSION_POLICY_INIT))
    roll_key = jr.fold_in(master, ch.TAG_SESSION_ROLLOUT)

    run = jax.jit(lambda s, p, t: rollout(dyn, policy, None, s, p, roll_key,
                                          chunk, t))

    plotter = None
    renderer = EnvRenderer(field_size)
    if plot:
        from die_tpu.render.plotting import InteractivePlotter

        plotter = InteractivePlotter.get(
            lambda: renderer.render(state.medium, state.agents))

    total_reward = 0.0
    try:
        from tqdm import trange

        pbar = trange(0, iters, chunk)
    except ImportError:  # pragma: no cover
        pbar = range(0, iters, chunk)

    for t in pbar:
        res = run(state, pstate, jnp_int32(t))
        state, pstate = res.state, res.pstate
        total_reward += float(np.asarray(res.total_reward))
        if hasattr(pbar, "set_postfix"):
            pbar.set_postfix(total_reward=np.round(total_reward, 3),
                             alive=int(np.asarray(res.num_agents)[-1]))
        if plotter is not None:
            plotter.draw()
    return state, total_reward


def run_minimal_fast(agent_ratio=0.15, field_size=(256, 256), iters=1000,
                     chunk=10, plot=False, seed=0):
    """Same loop on the field-centric lattice engine (die_tpu/fast)."""
    import jax.numpy as jnp

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.render_adapter import make_fast_render_fn
    from die_tpu.fast.rollout import fast_rollout

    dyn = FastDynamics(init_agent_ratio=agent_ratio)
    master = jr.PRNGKey(seed)
    holder = {"state": fast_init_jax(
        jr.fold_in(master, ch.TAG_SESSION_ENV_INIT), field_size, dyn)}
    roll_key = jr.fold_in(master, ch.TAG_SESSION_ROLLOUT)

    run = jax.jit(lambda s, t: fast_rollout(dyn, s, roll_key, chunk, t))

    plotter = None
    if plot:
        from die_tpu.render.plotting import InteractivePlotter

        renderer = EnvRenderer(field_size)
        plotter = InteractivePlotter.get(
            make_fast_render_fn(lambda: holder["state"], renderer))

    total_reward = 0.0
    try:
        from tqdm import trange

        pbar = trange(0, iters, chunk)
    except ImportError:  # pragma: no cover
        pbar = range(0, iters, chunk)
    for t in pbar:
        state, rewards, nums = run(holder["state"], jnp_int32(t))
        holder["state"] = state
        total_reward += float(np.asarray(rewards).sum())
        if hasattr(pbar, "set_postfix"):
            pbar.set_postfix(total_reward=np.round(total_reward, 3),
                             alive=int(np.asarray(nums)[-1]))
        if plotter is not None:
            plotter.draw()
    return holder["state"], total_reward



try:
    from die_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--agent", default="physarum",
                    choices=["physarum", "brownian"])
    ap.add_argument("--engine", default="exact", choices=["exact", "fast"])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--ratio", type=float, default=0.15)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    size = (args.size, args.size)
    if args.engine == "fast":
        _, reward = run_minimal_fast(agent_ratio=args.ratio, field_size=size,
                                     iters=args.iters, chunk=args.chunk,
                                     plot=args.plot)
    else:
        if args.agent == "brownian":
            policy = BrownianPolicy(move_scale=0.01)
        else:
            policy = PhysarumPolicy(max_agents=size[0] * size[1], scale=0.006,
                                    turn_angle=30, sense_offset=0.04)
        _, reward = run_minimal(policy, agent_ratio=args.ratio,
                                field_size=size, iters=args.iters,
                                chunk=args.chunk, plot=args.plot)
    print(f"total reward: {reward:.3f}")
