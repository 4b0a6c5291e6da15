"""StateBuilder API and perlin food-flow parity."""
import numpy as np
import jax
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.builder import StateBuilder
from die_tpu.core.config import Dynamics, FlowConfig
from die_tpu.core.env import env_step
from die_tpu.core.rng import np_key
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax, fast_init_np
from die_tpu.fast.rollout import fast_rollout, oracle_fast_rollout
from die_tpu.oracle.env import oracle_env_step, oracle_init_state

SIZE = (24, 24)


def test_builder_composition():
    st = (StateBuilder(SIZE, jr.PRNGKey(5))
          .with_const("env_food", 0.5)
          .with_food_perlin(threshold=0.25, octaves=8)
          .with_chem(threshold=0.1)
          .with_agents(ratio=0.1)
          .build_env_state(max_agents=128))
    medium = np.asarray(st.medium)
    assert medium.shape == (3, *SIZE)
    # perlin replaced the const fill; masked to [0, 0.25]
    assert 0 <= medium[ch.CH_MED_FOOD].min()
    assert medium[ch.CH_MED_FOOD].max() <= 0.25
    assert medium[ch.CH_MED_CHEM].max() <= 0.1
    assert set(np.unique(medium[ch.CH_MED_AGENTS])) <= {0.0, 1.0}
    agents = np.asarray(st.agents)
    assert agents.shape == (4, 128)
    n_alive = int((agents[ch.CH_AGT_ALIVE] > 0).sum())
    assert n_alive == min(128, int(medium[ch.CH_MED_AGENTS].sum()))
    # builder state steps fine
    dyn = Dynamics()
    action = np.zeros((3, 128), np.float32)
    _, info = jax.jit(lambda s, a: env_step(dyn, s, a))(st, action)
    assert np.isfinite(float(info.reward))


def test_builder_noise_channel():
    st = StateBuilder(SIZE, jr.PRNGKey(1)).with_noise("chem1", 0.2, 0.4)
    chem = np.asarray(st._channels["chem1"])
    assert 0.2 <= chem.min() and chem.max() <= 0.4


def test_perlin_flow_exact_engine_parity():
    dyn = Dynamics(flow=FlowConfig(kind="perlin", scale=0.3, decay=0.4,
                                   dt=0.05, octaves=4, seed=3))
    js = None
    os_ = oracle_init_state(np_key(2), SIZE, dyn)
    from die_tpu.core.init import init_env_state

    js = jax.jit(lambda k: init_env_state(k, SIZE, dyn))(jr.PRNGKey(2))
    action = np.zeros((3, SIZE[0] * SIZE[1]), np.float32)
    step = jax.jit(lambda s, a: env_step(dyn, s, a))
    for t in range(4):
        js, _ = step(js, action)
        os_, _, _ = oracle_env_step(dyn, os_, action)
        assert np.array_equal(np.asarray(js.medium), os_.medium), t
    # food actually changes over time
    assert not np.array_equal(os_.medium[ch.CH_MED_FOOD],
                              oracle_init_state(np_key(2), SIZE,
                                                dyn).medium[ch.CH_MED_FOOD])


def test_perlin_flow_fast_engine_parity():
    dyn = FastDynamics(flow=FlowConfig(kind="perlin", scale=0.3, decay=0.4,
                                       dt=0.05, octaves=4, seed=7))
    st_np = fast_init_np(np_key(4), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(4), SIZE, dyn)
    o_state, o_rew, _ = oracle_fast_rollout(dyn, st_np, np_key(5), 6)
    j_state, j_rew, _ = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(5), 6))(st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    assert np.array_equal(o_state.env_food, np.asarray(j_state.env_food))
    assert int(j_state.flow_step) == 6
