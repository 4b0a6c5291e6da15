"""Policy-vs-oracle parity on single forwards and the policy-state init."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.core.rng import np_fold_in, np_key
from die_tpu.models.gradient import GradientPolicy, PhysarumPolicy
from die_tpu.models.nca import NCAPolicy
from die_tpu.models.static import BrownianPolicy, ConstPolicy
from die_tpu.oracle.agents import (
    OracleBrownianAgent,
    OracleConstAgent,
    OracleGradientAgent,
    OraclePhysarumAgent,
)
from die_tpu.oracle.env import oracle_init_state
from die_tpu.oracle.nca import OracleNCAAgent

SIZE = (16, 16)
N = 256


def make_obs(seed=5):
    dyn = Dynamics()
    os_ = oracle_init_state(np_key(seed), SIZE, dyn, N)
    # put some chem down so gradients are non-trivial
    rng = np.random.default_rng(0)
    os_.medium[ch.CH_MED_CHEM] = rng.random(SIZE).astype(np.float32)
    obs_np = (os_.agents, os_.medium)
    obs_j = (jnp.asarray(os_.agents), jnp.asarray(os_.medium))
    return obs_np, obs_j


def test_const_parity():
    obs_np, obs_j = make_obs()
    p = ConstPolicy((0.01, -0.005), deposit=0.1)
    o = OracleConstAgent((0.01, -0.005), deposit=0.1)
    key = jr.PRNGKey(3)
    a_j, _ = jax.jit(lambda o_, k: p.forward(None, None, o_, k))(obs_j, key)
    a_o = o.forward(obs_np, np_key(3))
    assert np.array_equal(np.asarray(a_j), a_o)


def test_brownian_parity():
    obs_np, obs_j = make_obs()
    p = BrownianPolicy(move_scale=0.01, deposit_scale=0.5)
    o = OracleBrownianAgent(move_scale=0.01, deposit_scale=0.5)
    key = jr.PRNGKey(17)
    a_j, _ = jax.jit(lambda o_, k: p.forward(None, None, o_, k))(obs_j, key)
    a_o = o.forward(obs_np, np_key(17))
    assert np.array_equal(np.asarray(a_j), a_o)
    # dead slots must have zero action (alive-masked)
    dead = obs_np[0][ch.CH_AGT_ALIVE] == 0
    assert np.all(a_o[:, dead] == 0)


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(sense_offset=0.04, inertia=0.5, noise_scale=0.1),
    dict(normalized_grad=False, grad_clip=None),
])
def test_gradient_parity(kwargs):
    obs_np, obs_j = make_obs()
    p = GradientPolicy(max_agents=N, **kwargs)
    o = OracleGradientAgent(max_agents=N, **kwargs)
    init_key = jr.PRNGKey(21)
    ps = p.init_state(init_key)
    o.init_state(np_key(21))
    assert np.array_equal(np.asarray(ps.prev_grad), o.prev_grad)
    assert np.array_equal(np.asarray(ps.direction_rads), o.direction_rads)
    key = jr.PRNGKey(33)
    fwd = jax.jit(lambda s, o_, k: p.forward(None, s, o_, k))
    for t in range(3):
        k = jr.fold_in(key, t)
        a_j, ps = fwd(ps, obs_j, k)
        a_o = o.forward(obs_np, np_fold_in(np_key(33), t))
        assert np.array_equal(np.asarray(a_j), a_o), f"step {t}"
        assert np.array_equal(np.asarray(ps.prev_grad), o.prev_grad)
        assert np.array_equal(np.asarray(ps.direction_rads), o.direction_rads)


@pytest.mark.parametrize("kwargs", [
    dict(scale=0.007, turn_angle=30, sense_offset=0.04),
    dict(turn_angle=45, sense_angle=120, turn_tolerance=0.2),
])
def test_physarum_parity(kwargs):
    obs_np, obs_j = make_obs()
    p = PhysarumPolicy(max_agents=N, **kwargs)
    o = OraclePhysarumAgent(max_agents=N, **kwargs)
    ps = p.init_state(jr.PRNGKey(8))
    o.init_state(np_key(8))
    assert np.array_equal(np.asarray(ps.direction_rads), o.direction_rads)
    fwd = jax.jit(lambda s, o_, k: p.forward(None, s, o_, k))
    for t in range(3):
        a_j, ps = fwd(ps, obs_j, jr.fold_in(jr.PRNGKey(44), t))
        a_o = o.forward(obs_np, np_fold_in(np_key(44), t))
        assert np.array_equal(np.asarray(a_j), a_o), f"step {t}"


def test_nca_parity_and_roundtrip(tmp_path):
    obs_np, obs_j = make_obs()
    p = NCAPolicy(scale=0.01, deposit=2.0, kernel_sizes=(3, 3))
    o = OracleNCAAgent(scale=0.01, deposit=2.0, kernel_sizes=(3, 3))
    params = p.init_model_params(jr.PRNGKey(2))
    o.init_model_params(np_key(2))
    for pk, ok in zip(params, o.params):
        assert np.array_equal(np.asarray(pk), ok)
    a_j, _ = jax.jit(lambda pp, o_, k: p.forward(pp, None, o_, k))(
        params, obs_j, jr.PRNGKey(5))
    a_o = o.forward(obs_np, np_key(5))
    assert np.array_equal(np.asarray(a_j), a_o)

    # serialization round-trip (twin of reference test_serialize,
    # test/unit/agent.py:72-96)
    f = tmp_path / "nca.npz"
    p.save(f, params)
    p2, params2 = NCAPolicy.load(f)
    assert p2.init_params() == p.init_params()
    a2, _ = p2.forward(params2, None, obs_j, jr.PRNGKey(5))
    assert np.array_equal(np.asarray(a2), np.asarray(a_j))


def test_rule_policy_json_roundtrip(tmp_path):
    from die_tpu.models.base import Policy

    p = PhysarumPolicy(max_agents=64, scale=0.007, turn_angle=30,
                       sense_offset=0.04)
    f = tmp_path / "phys.json"
    p.save(f)
    p2 = Policy.load(f)
    assert isinstance(p2, PhysarumPolicy)
    assert p2.init_params() == p.init_params()


def test_callable_model_policy_masks_dead_slots():
    """Twin of ModelAgentSket (core/agent/learning.py:7-20), completed:
    arbitrary callable model + alive-mask postprocess."""
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core import channels as ch
    from die_tpu.core.builder import StateBuilder
    from die_tpu.models import CallableModelPolicy

    st = (StateBuilder((8, 16), jr.PRNGKey(0)).with_agents(0.3)
          .with_food_perlin().build_env_state(max_agents=64))
    pol = CallableModelPolicy(
        lambda obs: jnp.ones((3, obs[0].shape[1]), jnp.float32))
    action, pstate = pol.forward(None, None, (st.agents, st.medium),
                                 jr.PRNGKey(1))
    assert pstate is None
    alive = np.asarray(st.agents[ch.CH_AGT_ALIVE] > 0)
    out = np.asarray(action)
    assert np.all(out[:, alive] == 1.0)
    assert np.all(out[:, ~alive] == 0.0)
