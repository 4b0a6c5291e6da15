"""Full-trajectory parity (engine scan vs oracle loop) and vmap lockstep."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics, FlowConfig
from die_tpu.core.init import init_env_state
from die_tpu.core.rng import np_fold_in, np_key
from die_tpu.models.gradient import PhysarumPolicy
from die_tpu.models.static import BrownianPolicy
from die_tpu.oracle.agents import OracleBrownianAgent, OraclePhysarumAgent
from die_tpu.oracle.env import oracle_init_state
from die_tpu.oracle.rollout import oracle_rollout, oracle_session_keys
from die_tpu.parallel.rollout import batch_keys, rollout

SIZE = (24, 24)
N = SIZE[0] * SIZE[1]


def session(seed):
    master_j = jr.PRNGKey(seed)
    keys_j = (jr.fold_in(master_j, ch.TAG_SESSION_ENV_INIT),
              jr.fold_in(master_j, ch.TAG_SESSION_POLICY_INIT),
              jr.fold_in(master_j, ch.TAG_SESSION_ROLLOUT))
    keys_n = oracle_session_keys(np_key(seed))
    return keys_j, keys_n


@pytest.mark.parametrize("steps", [30])
def test_brownian_trajectory_bitwise(steps):
    dyn = Dynamics(init_agent_ratio=0.1)
    (kje, kjp, kjr), (kne, knp_, knr) = session(123)

    js = init_env_state(kje, SIZE, dyn)
    policy = BrownianPolicy(move_scale=0.01)
    res = jax.jit(lambda s, k: rollout(dyn, policy, None, s, None, k, steps)
                  )(js, kjr)

    os_ = oracle_init_state(kne, SIZE, dyn)
    agent = OracleBrownianAgent(move_scale=0.01)
    ofinal, orewards, onum = oracle_rollout(dyn, agent, os_, knr, steps)

    assert np.array_equal(np.asarray(res.rewards), orewards)
    assert np.array_equal(np.asarray(res.num_agents), onum)
    assert np.array_equal(np.asarray(res.state.medium), ofinal.medium)
    assert np.array_equal(np.asarray(res.state.agents), ofinal.agents)


@pytest.mark.parametrize("dyn", [
    Dynamics(init_agent_ratio=0.15),
    Dynamics(init_agent_ratio=0.15, agents_die=True,
             flow=FlowConfig(kind="wave")),
])
def test_physarum_trajectory_bitwise(dyn):
    steps = 20
    (kje, kjp, kjr), (kne, knp_, knr) = session(7)

    policy = PhysarumPolicy(max_agents=N, scale=0.007, turn_angle=30,
                            sense_offset=0.04)
    js = init_env_state(kje, SIZE, dyn)
    ps = policy.init_state(kjp)
    res = jax.jit(lambda s, p, k: rollout(dyn, policy, None, s, p, k, steps)
                  )(js, ps, kjr)

    agent = OraclePhysarumAgent(max_agents=N, scale=0.007, turn_angle=30,
                                sense_offset=0.04)
    os_ = oracle_init_state(kne, SIZE, dyn)
    agent.init_state(knp_)
    ofinal, orewards, onum = oracle_rollout(dyn, agent, os_, knr, steps)

    assert np.array_equal(np.asarray(res.rewards), orewards)
    assert np.array_equal(np.asarray(res.state.agents), ofinal.agents)
    assert np.array_equal(np.asarray(res.state.medium), ofinal.medium)


def test_vmap_lockstep_equals_sequential():
    """B vmapped envs == B independent single rollouts, bitwise (SURVEY §4d)."""
    dyn = Dynamics(init_agent_ratio=0.1)
    B, steps = 4, 10
    policy = BrownianPolicy()
    master = jr.PRNGKey(99)
    env_keys = jax.vmap(lambda b: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_ENV_INIT), b))(jnp.arange(B))
    roll_keys = jax.vmap(lambda b: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_ROLLOUT), b))(jnp.arange(B))

    init_b = jax.vmap(lambda k: init_env_state(k, SIZE, dyn))
    states = init_b(env_keys)
    batched = jax.jit(jax.vmap(
        lambda s, k: rollout(dyn, policy, None, s, None, k, steps)))
    res_b = batched(states, roll_keys)

    single = jax.jit(lambda s, k: rollout(dyn, policy, None, s, None, k, steps))
    for b in range(B):
        sb = jax.tree.map(lambda x: x[b], states)
        res_1 = single(sb, roll_keys[b])
        assert np.array_equal(np.asarray(res_b.rewards[b]),
                              np.asarray(res_1.rewards)), b
        assert np.array_equal(np.asarray(res_b.state.agents[b]),
                              np.asarray(res_1.state.agents)), b


def test_choose_bands_validates_kernel_geometry():
    """choose_bands must only return band counts the banded kernel accepts
    (advisor finding, round 1: W=16, H=8192 landed on bands=2 with
    W - Wb < 2r and raised instead of falling back)."""
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.pallas_step import make_pallas_banded_step
    from die_tpu.fast.rollout import choose_bands

    dyn = FastDynamics()
    for W, H in [(16, 8192), (32, 4096), (512, 512), (1024, 1024),
                 (64, 1024), (8, 65536), (2048, 256)]:
        bands = choose_bands(dyn, W, H)
        assert bands >= 1, (W, H)
        if bands > 1:
            # constructing the kernel must not raise for the chosen count
            make_pallas_banded_step(dyn, (W, H), bands)


def test_perlin_resume_checks_flow_step():
    """pallas_fast_rollout_multi precomputes perlin flow fields from t0;
    a concrete state with flow_step != t0 must be rejected, not silently
    given wrong-time flow fields (advisor finding, round 1)."""
    import jax.numpy as jnp
    import pytest

    from die_tpu.core.config import FlowConfig
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

    dyn = FastDynamics(flow=FlowConfig(kind="perlin"))
    st = fast_init_jax(jr.PRNGKey(0), (8, 128), dyn)
    st = st._replace(flow_step=jnp.int32(5))
    with pytest.raises(ValueError, match="flow_step"):
        pallas_fast_rollout_multi(dyn, st, jr.PRNGKey(1), 4, num_inner=2,
                                  t0=0, interpret=True)
    # matching t0 passes the check (interpret-mode smoke)
    pallas_fast_rollout_multi(dyn, st, jr.PRNGKey(1), 4, num_inner=2,
                              t0=5, interpret=True)


def test_fast_rollout_auto_cpu_falls_back_to_xla():
    """On CPU the auto-selector must use the XLA scan (Pallas needs TPU)."""
    import jax.random as jr

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.rollout import fast_rollout, fast_rollout_auto

    dyn = FastDynamics()
    st = fast_init_jax(jr.PRNGKey(0), (512, 128), dyn)
    a_state, a_rew, _ = jax.jit(
        lambda s: fast_rollout_auto(dyn, s, jr.PRNGKey(1), 4))(st)
    b_state, b_rew, _ = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(1), 4))(st)
    assert np.array_equal(np.asarray(a_state.occ), np.asarray(b_state.occ))
    assert np.array_equal(np.asarray(a_rew), np.asarray(b_rew))
