"""Config-fuzzed engine-vs-oracle parity: randomized (seeded) Dynamics and
FastDynamics samples must hold bitwise parity on short rollouts."""
import random

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core.config import Boundary, Dynamics, FlowConfig
from die_tpu.core.env import env_step
from die_tpu.core.init import init_env_state
from die_tpu.core.rng import np_key, np_random_bits, uniform01_from_bits
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax, fast_init_np
from die_tpu.fast.rollout import fast_rollout, oracle_fast_rollout
from die_tpu.oracle.env import oracle_env_step, oracle_init_state

SIZE = (16, 16)
N = 64


def _sample_dynamics(rng: random.Random) -> Dynamics:
    flow = rng.choice([
        FlowConfig(),
        FlowConfig(kind="wave", scale=rng.uniform(0.1, 1.0),
                   decay=rng.uniform(0.1, 0.9)),
        FlowConfig(kind="perlin", octaves=rng.choice([2, 4]),
                   seed=rng.randrange(100), dt=0.05),
    ])
    return Dynamics(
        rate_feed=rng.uniform(0.01, 0.3),
        rate_decay_chem=rng.uniform(0.01, 0.3),
        boundary=rng.choice(list(Boundary)),
        diffuse_sigma=rng.choice([0.5, 0.8, 1.2]),
        zero_cost=rng.random() < 0.3,
        apply_sense_mask=rng.random() < 0.3,
        food_infinite=rng.random() < 0.5,
        agents_die=rng.random() < 0.5,
        init_agent_ratio=rng.uniform(0.05, 0.4),
        flow=flow,
        # exercise both deposit-scatter formulations at fuzz sizes
        force_stable_scatter=rng.random() < 0.5,
    )


@pytest.mark.parametrize("case", range(8))
def test_fuzz_exact_engine(case):
    rng = random.Random(1000 + case)
    dyn = _sample_dynamics(rng)
    seed = rng.randrange(10000)
    os_ = oracle_init_state(np_key(seed), SIZE, dyn, N)
    js = jax.jit(lambda k: init_env_state(k, SIZE, dyn, N))(jr.PRNGKey(seed))
    step = jax.jit(lambda s, a: env_step(dyn, s, a))
    for t in range(3):
        bits = np_random_bits(np_key(5000 + case * 10 + t), (3, N))
        action = ((uniform01_from_bits(bits) - np.float32(0.5))
                  * np.float32(0.05)).astype(np.float32)
        js, jinfo = step(js, jnp.asarray(action))
        os_, reward, oinfo = oracle_env_step(dyn, os_, action)
        assert np.array_equal(np.asarray(js.medium), os_.medium), (dyn, t)
        assert np.array_equal(np.asarray(js.agents), os_.agents), (dyn, t)
        assert np.asarray(jinfo.reward) == reward, (dyn, t)


def _sample_fast(rng: random.Random) -> FastDynamics:
    return FastDynamics(
        num_dirs=rng.choice([4, 8, 16]),
        sense_dist=rng.choice([1, 3, 5]),
        randomize_on_block=rng.random() < 0.7,
        deposit_coef=rng.uniform(0.5, 6.0),
        idle_deposit=rng.uniform(0.0, 0.3),
        rate_feed=rng.uniform(0.01, 0.3),
        agents_die=rng.random() < 0.4,
        agents_born=rng.random() < 0.3,
        birth_threshold=rng.uniform(0.2, 1.0),
        food_infinite=rng.random() < 0.5,
        rng_kind=rng.choice(["murmur", "threefry"]),
        init_agent_ratio=rng.uniform(0.05, 0.4),
        diffuse_sigma=rng.choice([0.5, 0.8]),
    )


@pytest.mark.parametrize("case", range(8))
def test_fuzz_fast_engine(case):
    rng = random.Random(2000 + case)
    dyn = _sample_fast(rng)
    seed = rng.randrange(10000)
    st_np = fast_init_np(np_key(seed), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(seed), SIZE, dyn)
    o_state, o_rew, o_num = oracle_fast_rollout(dyn, st_np,
                                                np_key(seed + 1), 5)
    j_state, j_rew, j_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(seed + 1), 5))(st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew)), dyn
    assert np.array_equal(o_num, np.asarray(j_num)), dyn
    for name, a, b in zip(o_state._fields, o_state, j_state):
        if name == "flow_step":
            continue
        assert np.array_equal(np.asarray(a), np.asarray(b)), (dyn, name)
