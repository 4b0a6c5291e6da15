"""The open operator extension point (reference core/env.py:44-46,
core/data_init.py:29-38): user-registered cost/flow rules plug in by name
without editing the package, and the oracle hook keeps bit-exact parity
testing available for them.

The custom operators here are deliberately written TWICE: a backend-generic
engine form (vectorized xp ops) and an independent per-element NumPy
restatement registered as ``oracle_fn`` — the two-implementation pattern the
built-in substeps follow (die_tpu/oracle/*)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from die_tpu.core.config import Dynamics, FlowConfig
from die_tpu.core.env import env_step
from die_tpu.core.operators import (
    get_cost_operator,
    get_flow_operator,
    register_cost_operator,
    register_flow_operator,
)
from die_tpu.oracle.env import oracle_env_step

from test_env_parity import assert_state_equal, make_states, random_action

# --------------------------------------------------------------- operators
# custom cost: quadratic distance + linear deposit, computed per slot as
#   c = 0.05 * (dx*dx + dy*dy) + 0.01 * |deposit|
_QA = np.float32(0.05)
_QB = np.float32(0.01)


@register_cost_operator("test_quad", oracle_fn=lambda xp, dyn, action: (
    _quad_cost_restated(action)))
def quad_cost(xp, dynamics, action):
    dx, dy, dep = action[0], action[1], action[2]
    return _QA * (dx * dx + dy * dy) + _QB * xp.abs(dep)


def _quad_cost_restated(action):
    """Independent per-element restatement (same per-slot op order — the
    fp32 arithmetic contract — but written as an explicit Python loop)."""
    n = action.shape[-1]
    out = np.zeros((n,), np.float32)
    for i in range(n):
        dx = np.float32(action[0, i])
        dy = np.float32(action[1, i])
        dep = np.float32(action[2, i])
        out[i] = np.float32(
            np.float32(_QA * np.float32(dx * dx + dy * dy))
            + np.float32(_QB * np.float32(abs(dep))))
    return out


# custom flow: a "drip" column of food that sweeps across the field —
#   food' = (1 - decay) * food + scale * [column == flow_step mod H]
def drip_flow(xp, flow, food, flow_step):
    H = food.shape[-1]
    col = xp.arange(H, dtype=xp.int32)
    hit = (col[None, :] == xp.int32(flow_step) % H).astype(xp.float32)
    return (np.float32(1.0) - np.float32(flow.decay)) * food \
        + np.float32(flow.scale) * hit


def drip_flow_restated(xp, flow, food, flow_step):
    W, H = food.shape
    keep = np.float32(np.float32(1.0) - np.float32(flow.decay))
    s = np.float32(flow.scale)
    t = int(flow_step) % H
    out = np.zeros((W, H), np.float32)
    for i in range(W):
        for j in range(H):
            hit = np.float32(1.0) if j == t else np.float32(0.0)
            out[i, j] = np.float32(np.float32(keep * food[i, j])
                                   + np.float32(s * hit))
    return out


register_flow_operator("test_drip", drip_flow, oracle_fn=drip_flow_restated)


# ------------------------------------------------------------------ tests
def test_registry_errors():
    with pytest.raises(KeyError, match="register_cost_operator"):
        get_cost_operator("nope")
    with pytest.raises(KeyError, match="register_flow_operator"):
        get_flow_operator("nope")
    with pytest.raises(ValueError, match="built in"):
        register_flow_operator("wave", lambda *a: None)
    with pytest.raises(TypeError):
        register_cost_operator("", lambda *a: None)
    assert get_cost_operator("test_quad") is quad_cost
    assert get_flow_operator("test_drip", oracle=True) is drip_flow_restated


def test_config_json_roundtrip_and_hashable():
    dyn = Dynamics(cost_op="test_quad",
                   flow=FlowConfig(kind="test_drip", scale=0.3, decay=0.1))
    assert hash(dyn) == hash(Dynamics.from_json(dyn.to_json()))
    assert Dynamics.from_json(dyn.to_json()) == dyn
    jax.jit(lambda s: s, static_argnums=())  # configs stay jit-static
    assert dyn.cost_op == "test_quad" and dyn.flow.kind == "test_drip"


@pytest.mark.parametrize("dyn", [
    Dynamics(cost_op="test_quad"),
    Dynamics(flow=FlowConfig(kind="test_drip", scale=0.3, decay=0.1)),
    Dynamics(cost_op="test_quad",
             flow=FlowConfig(kind="test_drip", scale=0.3, decay=0.1)),
])
def test_custom_operator_parity(dyn):
    """End-to-end: engine (jit, vectorized operator) vs oracle (per-element
    restated operator) — bitwise at fp32 over a multi-step trajectory."""
    dyn, js, os_ = make_states(seed=21, dynamics=dyn)
    step = jax.jit(lambda s, a: env_step(dyn, s, a))
    for t in range(5):
        action = random_action(300 + t, os_.agents.shape[-1])
        js, info = step(js, jnp.asarray(action))
        os_, reward, oinfo = oracle_env_step(dyn, os_, action)
        assert_state_equal(js, os_, f"t={t}")
        assert np.asarray(info.reward) == reward, f"reward t={t}"
    if dyn.flow.kind == "test_drip":
        assert int(js.flow_step) == 5 and int(os_.flow_step) == 5


def test_custom_flow_fast_engine():
    """The lattice engine's XLA path accepts registered flow kinds; the
    Mosaic kernels reject them with a clear error."""
    from die_tpu.core.rng import np_key
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.env import fast_step
    from die_tpu.fast.init import fast_init_np
    from die_tpu.fast.rollout import fast_rollout, oracle_fast_rollout

    dyn = FastDynamics(flow=FlowConfig(kind="test_drip", scale=0.2,
                                       decay=0.05))
    st = fast_init_np(np_key(31), (16, 16), dyn)
    o_st, o_rewards, _ = oracle_fast_rollout(dyn, st, np_key(32), 4)
    j_st, j_rewards, _ = fast_rollout(dyn, st, np_key(32), 4)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(j_st, name)),
                              np.asarray(getattr(o_st, name))), name
    assert np.array_equal(np.asarray(j_rewards), np.asarray(o_rewards))
    assert int(j_st.flow_step) == 4

    from die_tpu.fast.pallas_step import make_pallas_step

    with pytest.raises(NotImplementedError, match="custom flow"):
        make_pallas_step(dyn, (256, 256))


def test_custom_flow_fast_naive_oracle():
    """The independent naive lattice oracle honors the oracle_fn hook."""
    from die_tpu.core.rng import np_key
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_np
    from die_tpu.fast.rollout import oracle_fast_rollout
    from die_tpu.oracle.fast_naive import naive_fast_rollout

    dyn = FastDynamics(flow=FlowConfig(kind="test_drip", scale=0.2,
                                       decay=0.05))
    # pow2 size: the naive reward fold contract (fast_naive docstring)
    st = fast_init_np(np_key(41), (16, 16), dyn)
    n_st, n_r, _ = naive_fast_rollout(dyn, st, np_key(42), 3)
    e_st, e_r, _ = oracle_fast_rollout(dyn, st, np_key(42), 3)
    np.testing.assert_array_equal(n_r, e_r)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(n_st, name)),
                              np.asarray(getattr(e_st, name))), name
