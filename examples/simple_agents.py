"""Experiment matrix of rule-based agents x dynamics presets — twin of
examples/simple_agents.py:77-107, with the substep-by-substep debug harness
(`manual_step`, twin of examples/simple_agents.py:14-28)."""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import numpy as np
import jax
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics, FlowConfig
from die_tpu.core.env import (
    _deposit_and_layout,
    _diffuse_decay,
    _feed,
    _lifecycle,
    _move,
    _resource_dynamics,
)
from die_tpu.core.init import init_env_state
from die_tpu.core.state import EnvState
from die_tpu.models.gradient import GradientPolicy, PhysarumPolicy
from die_tpu.models.static import BrownianPolicy, ConstPolicy
from examples.minimal_run import run_minimal


def manual_step(dyn: Dynamics, state: EnvState, action):
    """Run Env.step substep-by-substep for debugging (the reference's
    _manual_step harness) — returns the state after each substep."""
    stages = {}
    agents = _move(dyn, state.agents, action)
    stages["move"] = agents
    medium = _deposit_and_layout(dyn, state.medium, agents, action)
    stages["deposit"] = medium
    medium, agents, gained = _feed(dyn, medium, agents, action)
    stages["feed"] = (medium, agents, gained)
    agents = _lifecycle(dyn, agents)
    stages["lifecycle"] = agents
    medium, flow_step = _resource_dynamics(dyn, medium, state.flow_step)
    stages["flow"] = medium
    medium = _diffuse_decay(dyn, medium)
    stages["diffuse"] = medium
    return EnvState(medium, agents, flow_step), stages


AGENTS = {
    "const": lambda n: ConstPolicy((0.005, 0.005), deposit=0.1),
    "brownian": lambda n: BrownianPolicy(move_scale=0.01),
    "gradient": lambda n: GradientPolicy(max_agents=n, scale=0.01,
                                         sense_offset=0.02),
    "physarum": lambda n: PhysarumPolicy(max_agents=n, scale=0.006,
                                         turn_angle=30, sense_offset=0.04),
}

DYNAMICS = {
    "st-perlin": lambda r: Dynamics(init_agent_ratio=r, food_infinite=True),
    "st-perlin-finite": lambda r: Dynamics(init_agent_ratio=r),
    "dyn-pred": lambda r: Dynamics(init_agent_ratio=r,
                                   flow=FlowConfig(kind="wave")),
}


def run_experiment(field_size=128, iters=100, agent_ratio=0.15,
                   agents=("brownian", "physarum"),
                   dynamics=("st-perlin",), plot=False):
    n = field_size * field_size
    results = {}
    for dyn_id in dynamics:
        for agent_id in agents:
            policy = AGENTS[agent_id](n)
            dyn = DYNAMICS[dyn_id](agent_ratio)
            _, reward = run_minimal(policy, agent_ratio=agent_ratio,
                                    field_size=(field_size, field_size),
                                    iters=iters, chunk=10, plot=plot)
            results[(dyn_id, agent_id)] = reward
            print(f"{dyn_id:18s} {agent_id:10s} total_reward={reward:.3f}")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()
    run_experiment(field_size=args.size, iters=args.iters, plot=args.plot)
