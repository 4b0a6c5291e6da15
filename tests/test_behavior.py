"""Qualitative behavior parity — the reference's README claim (README.md:17,
core/__init__.py:311-318): Physarum outperforms Brownian at food consumption."""
import numpy as np
import pytest

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.rng import np_fold_in, np_key
from die_tpu.oracle.agents import OracleBrownianAgent, OraclePhysarumAgent
from die_tpu.oracle.env import (
    oracle_env_step,
    oracle_init_state,
    oracle_observe,
)

SIZE = (48, 48)
STEPS = 120


def _consumed(agent, seed=5):
    dyn = Dynamics(init_agent_ratio=0.12)
    st = oracle_init_state(np_key(seed), SIZE, dyn)
    if hasattr(agent, "init_state"):
        agent.init_state(np_fold_in(np_key(seed), 1))
    food0 = st.medium[ch.CH_MED_FOOD].sum()
    key = np_fold_in(np_key(seed), 2)
    for t in range(STEPS):
        kp = np_fold_in(np_fold_in(key, t), ch.TAG_POLICY)
        action = agent.forward(oracle_observe(dyn, st), kp)
        st, _, _ = oracle_env_step(dyn, st, action)
    return float(food0 - st.medium[ch.CH_MED_FOOD].sum())


@pytest.mark.slow
def test_physarum_outforages_brownian():
    n = SIZE[0] * SIZE[1]
    b = _consumed(OracleBrownianAgent(move_scale=0.01))
    p = _consumed(OraclePhysarumAgent(max_agents=n, scale=0.007,
                                      turn_angle=30, sense_offset=0.04,
                                      deposit=4.0))
    assert p > b, (p, b)
