"""Engine-vs-oracle parity: init, single substeps via full steps, and the
semantics ledger cases (duplicate scatter/gather, dead slots, boundaries)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core import channels as ch
from die_tpu.core.config import Boundary, Dynamics, FlowConfig
from die_tpu.core.env import env_step, observe
from die_tpu.core.init import init_env_state
from die_tpu.core.rng import np_key, np_random_bits, uniform01_from_bits
from die_tpu.core.state import EnvState
from die_tpu.oracle.env import (
    oracle_env_step,
    oracle_init_state,
    oracle_observe,
)

SIZE = (24, 20)


def make_states(seed=11, dynamics=None, max_agents=None):
    dyn = dynamics or Dynamics()
    key = jr.PRNGKey(seed)
    nkey = np_key(seed)
    js = jax.jit(lambda k: init_env_state(k, SIZE, dyn, max_agents),
                 )(key)
    os_ = oracle_init_state(nkey, SIZE, dyn, max_agents)
    return dyn, js, os_


def assert_state_equal(js: EnvState, os_, msg=""):
    assert np.array_equal(np.asarray(js.medium), os_.medium), f"medium {msg}"
    assert np.array_equal(np.asarray(js.agents), os_.agents), f"agents {msg}"


def random_action(seed, n, scale=0.02, dep=0.6):
    bits = np_random_bits(np_key(seed), (3, n))
    u = uniform01_from_bits(bits)
    a = (u - np.float32(0.5)) * np.float32(2 * scale)
    a[2] = u[2] * np.float32(dep)
    return a.astype(np.float32)


def test_init_parity():
    _, js, os_ = make_states()
    assert_state_equal(js, os_, "init")
    # sanity: some agents alive, food present, chem zero
    assert os_.agents[ch.CH_AGT_ALIVE].sum() > 0
    assert os_.medium[ch.CH_MED_FOOD].max() > 0
    assert os_.medium[ch.CH_MED_CHEM].max() == 0


@pytest.mark.parametrize("dyn", [
    Dynamics(),
    Dynamics(boundary=Boundary.LIMIT),
    Dynamics(agents_die=True),
    Dynamics(food_infinite=True),
    Dynamics(zero_cost=True),
    Dynamics(rate_decay_chem=0.025, diffuse_sigma=0.8),
    Dynamics(flow=FlowConfig(kind="wave", scale=0.5, decay=0.5)),
])
def test_step_parity_across_dynamics(dyn):
    dyn, js, os_ = make_states(seed=3, dynamics=dyn)
    step = jax.jit(lambda s, a: env_step(dyn, s, a), static_argnums=())
    for t in range(5):
        action = random_action(100 + t, os_.agents.shape[-1])
        js, info = step(js, jnp.asarray(action))
        os_, reward, oinfo = oracle_env_step(dyn, os_, action)
        assert_state_equal(js, os_, f"t={t}")
        assert np.asarray(info.reward) == reward, f"reward t={t}"
        assert int(info.num_agents) == oinfo["num_agents"]
        assert np.asarray(info.mean_reward) == oinfo["mean_reward"]


def test_duplicate_deposit_last_wins():
    """SURVEY §3-B ledger #1: K co-located agents -> chem gains only the
    highest-index agent's deposit."""
    dyn = Dynamics()
    W, H = 8, 8
    n = 4
    agents = np.zeros((4, n), np.float32)
    # all 3 alive agents on the same cell (0.5, 0.5) -> cell (3..4)
    agents[0, :3] = 0.5
    agents[1, :3] = 0.5
    agents[2, :3] = 1.0
    medium = np.zeros((3, W, H), np.float32)
    action = np.zeros((3, n), np.float32)
    action[2] = [1.0, 2.0, 3.0, 99.0]  # slot 3 dead — must be ignored

    from die_tpu.oracle.env import OracleState

    os_ = OracleState(medium.copy(), agents.copy(), np.int32(0))
    js = EnvState(jnp.asarray(medium), jnp.asarray(agents),
                  jnp.zeros((), jnp.int32))
    os2, _, _ = oracle_env_step(dyn, os_, action)
    js2, _ = jax.jit(lambda s, a: env_step(dyn, s, a))(js, jnp.asarray(action))
    assert_state_equal(js2, os2, "dup deposit")
    # the cell got exactly one deposit (3.0), then diffused+decayed:
    # total chem mass = 3.0 * (1 - rate_decay)
    total = float(np.asarray(js2.medium[ch.CH_MED_CHEM]).sum())
    assert abs(total - 3.0 * 0.9) < 1e-4


def test_dead_slots_feed_and_burn():
    """Ledger #3: dead slots at (0,0) gather cell-(0,0) food and burn cost."""
    dyn = Dynamics()
    W, H = 8, 8
    n = 3
    agents = np.zeros((4, n), np.float32)
    agents[0, 0] = 0.0   # alive agent AT cell (0,0)
    agents[1, 0] = 0.0
    agents[2, 0] = 1.0
    medium = np.zeros((3, W, H), np.float32)
    medium[ch.CH_MED_FOOD] = 0.5
    action = np.zeros((3, n), np.float32)
    action[0, 1] = 0.03  # dead slot with nonzero action -> burns cost
    from die_tpu.oracle.env import OracleState

    os_ = OracleState(medium.copy(), agents.copy(), np.int32(0))
    os2, reward, info = oracle_env_step(dyn, os_, action)
    # dead slot 1 gathered cell-(0,0) food (occupied by agent 0): 0.1*0.5
    gain_dead = os2.agents[ch.CH_AGT_FOOD, 1]
    assert gain_dead == pytest.approx(0.05 - 0.01 * 0.03, abs=1e-6)
    # dead slot 2: same gather, no cost
    assert os2.agents[ch.CH_AGT_FOOD, 2] == pytest.approx(0.05, abs=1e-7)
    # engine matches
    js = EnvState(jnp.asarray(medium), jnp.asarray(agents),
                  jnp.zeros((), jnp.int32))
    js2, _ = jax.jit(lambda s, a: env_step(dyn, s, a))(js, jnp.asarray(action))
    assert_state_equal(js2, os2, "dead slots")


def test_sense_mask_obs_parity():
    dyn = Dynamics(apply_sense_mask=True)
    dyn2, js, os_ = make_states(seed=7, dynamics=dyn)
    oa, om = oracle_observe(dyn, os_)
    ja, jm = jax.jit(lambda s: observe(dyn, s))(js)
    assert np.array_equal(np.asarray(ja), oa)
    assert np.array_equal(np.asarray(jm), om)
    # mask actually hides far-away cells
    assert float(om[ch.CH_MED_FOOD].sum()) <= float(os_.medium[ch.CH_MED_FOOD].sum())


def test_terminated_on_extinction():
    dyn = Dynamics(agents_die=True)
    W, H = 8, 8
    agents = np.zeros((4, 2), np.float32)
    agents[2, 0] = 1.0
    agents[3, 0] = 1e-6  # will die this step
    medium = np.zeros((3, W, H), np.float32)
    from die_tpu.oracle.env import OracleState

    action = np.zeros((3, 2), np.float32)
    os_ = OracleState(medium, agents, np.int32(0))
    os2, _, info = oracle_env_step(dyn, os_, action)
    assert info["num_agents"] == 0 and info["terminated"]
    js = EnvState(jnp.asarray(medium), jnp.asarray(agents),
                  jnp.zeros((), jnp.int32))
    js2, jinfo = jax.jit(lambda s, a: env_step(dyn, s, a))(js,
                                                           jnp.asarray(action))
    assert bool(jinfo.terminated) and int(jinfo.num_agents) == 0
    assert_state_equal(js2, os2, "extinction")


@pytest.mark.parametrize("dyn", [Dynamics(agents_die=True)])
def test_exact_engine_extinction_path(dyn):
    """Starvation run: population must shrink monotonically to extinction and
    the terminated flag must fire, with invariants held throughout."""
    from die_tpu.oracle.agents import OracleConstAgent
    from die_tpu.utils.invariants import check_env_state

    dyn = Dynamics(agents_die=True, rate_feed=0.0,
                   cost_weight_dist=5.0, init_agent_ratio=0.2)
    os_ = oracle_init_state(np_key(44), (12, 12), dyn, 144)
    agent = OracleConstAgent((0.01, 0.01), deposit=0.0)
    prev = 10**9
    terminated = False
    for t in range(60):
        action = agent.forward((os_.agents, os_.medium), None)
        os_, _, info = oracle_env_step(dyn, os_, action)
        assert check_env_state(os_) == [], t
        assert info["num_agents"] <= prev
        prev = info["num_agents"]
        if info["terminated"]:
            terminated = True
            break
    assert terminated and prev == 0


def test_manual_step_composes_to_env_step():
    """The substep-by-substep debug harness (examples/simple_agents.manual_step,
    the reference's _manual_step twin) must reproduce env_step exactly."""
    import sys
    sys.path.insert(0, ".")
    from examples.simple_agents import manual_step

    dyn, js, _ = make_states(seed=13)
    action = jnp.asarray(random_action(55, js.agents.shape[-1]))
    ref_state, _ = jax.jit(lambda s, a: env_step(dyn, s, a))(js, action)
    man_state, stages = jax.jit(lambda s, a: manual_step(dyn, s, a))(js, action)
    assert set(stages) == {"move", "deposit", "feed", "lifecycle", "flow",
                           "diffuse"}
    assert np.array_equal(np.asarray(ref_state.medium),
                          np.asarray(man_state.medium))
    assert np.array_equal(np.asarray(ref_state.agents),
                          np.asarray(man_state.agents))
