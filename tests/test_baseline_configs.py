"""BASELINE.md benchmark configs as bitwise lockstep-parity tests.

Config #1 (examples/minimal_run.py): BrownianAgent(move_scale=0.01), 64x64,
agent_ratio=0.1, 300 iters — run at FULL length, trajectory compared
bit-for-bit against the oracle.
Config #2: PhysarumAgent(scale=0.007, turn_angle=30, sense_offset=0.04) on
256x256 — shortened to 30 iters for CPU runtime (the full-length Physarum
parity at smaller size is covered in test_rollout.py).
"""
import numpy as np
import jax
import jax.random as jr
import pytest

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.core.rng import np_key
from die_tpu.models.gradient import PhysarumPolicy
from die_tpu.models.static import BrownianPolicy
from die_tpu.oracle.agents import OracleBrownianAgent, OraclePhysarumAgent
from die_tpu.oracle.env import oracle_init_state
from die_tpu.oracle.rollout import oracle_rollout, oracle_session_keys
from die_tpu.parallel.rollout import rollout


def _session(seed):
    master_j = jr.PRNGKey(seed)
    keys_j = tuple(jr.fold_in(master_j, t) for t in (
        ch.TAG_SESSION_ENV_INIT, ch.TAG_SESSION_POLICY_INIT,
        ch.TAG_SESSION_ROLLOUT))
    return keys_j, oracle_session_keys(np_key(seed))


@pytest.mark.slow
def test_baseline_config1_brownian_300_iters_bitwise():
    dyn = Dynamics(init_agent_ratio=0.1)
    size = (64, 64)
    steps = 300
    (kje, _, kjr), (kne, _, knr) = _session(2026)

    policy = BrownianPolicy(move_scale=0.01)
    js = init_env_state(kje, size, dyn)
    res = jax.jit(lambda s, k: rollout(dyn, policy, None, s, None, k, steps)
                  )(js, kjr)

    os_ = oracle_init_state(kne, size, dyn)
    agent = OracleBrownianAgent(move_scale=0.01)
    ofinal, orewards, onum = oracle_rollout(dyn, agent, os_, knr, steps)

    assert np.array_equal(np.asarray(res.rewards), orewards)
    assert np.array_equal(np.asarray(res.num_agents), onum)
    assert np.array_equal(np.asarray(res.state.medium), ofinal.medium)
    assert np.array_equal(np.asarray(res.state.agents), ofinal.agents)


@pytest.mark.slow
def test_baseline_config2_physarum_256_bitwise():
    dyn = Dynamics(init_agent_ratio=0.15)
    size = (256, 256)
    n = 65536
    steps = 30
    (kje, kjp, kjr), (kne, knp_, knr) = _session(7)

    policy = PhysarumPolicy(max_agents=n, scale=0.007, turn_angle=30,
                            sense_offset=0.04)
    js = init_env_state(kje, size, dyn, n)
    ps = policy.init_state(kjp)
    res = jax.jit(lambda s, p, k: rollout(dyn, policy, None, s, p, k, steps)
                  )(js, ps, kjr)

    agent = OraclePhysarumAgent(max_agents=n, scale=0.007, turn_angle=30,
                                sense_offset=0.04)
    os_ = oracle_init_state(kne, size, dyn, n)
    agent.init_state(knp_)
    ofinal, orewards, onum = oracle_rollout(dyn, agent, os_, knr, steps)

    assert np.array_equal(np.asarray(res.rewards), orewards)
    assert np.array_equal(np.asarray(res.state.agents), ofinal.agents)
    assert np.array_equal(np.asarray(res.state.medium), ofinal.medium)
