"""Fused-sense rollout (round-3 exact-engine optimization): feed(t)'s
mixed (food, occupancy) gather also supplies sense(t+1)'s food value —
trajectories must be bitwise identical to the unfused policy∘step loop,
and the gate must route ineligible configs to the plain path."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core.config import Dynamics, FlowConfig
from die_tpu.core.env import env_step, fused_sense_ok, observe
from die_tpu.core.init import init_env_state
from die_tpu.core import channels as ch
from die_tpu.models.gradient import PhysarumPolicy
from die_tpu.parallel.rollout import rollout

SIZE = (24, 20)
N = 64
STEPS = 6


def unfused_reference(dyn, policy, state, pstate, key, steps):
    """Plain observe -> forward -> env_step loop (no carry)."""
    rewards = []
    for t in range(steps):
        key_t = jr.fold_in(key, t)
        obs = observe(dyn, state)
        action, pstate = policy.forward(
            None, pstate, obs, jr.fold_in(key_t, ch.TAG_POLICY))
        state, info = env_step(dyn, state, action)
        rewards.append(info.reward)
    return state, pstate, jnp.stack(rewards)


def _run_both(dyn):
    policy = PhysarumPolicy(max_agents=N, scale=0.01, sense_offset=0.03)
    state = jax.jit(lambda k: init_env_state(k, SIZE, dyn, N))(jr.PRNGKey(3))
    pstate = policy.init_state(jr.PRNGKey(4))
    res = jax.jit(lambda s, p: rollout(dyn, policy, None, s, p,
                                       jr.PRNGKey(5), STEPS))(state, pstate)
    ref_state, ref_pstate, ref_rewards = jax.jit(
        lambda s, p: unfused_reference(dyn, policy, s, p, jr.PRNGKey(5),
                                       STEPS))(state, pstate)
    assert np.array_equal(np.asarray(res.rewards), np.asarray(ref_rewards))
    assert np.array_equal(np.asarray(res.state.medium),
                          np.asarray(ref_state.medium))
    assert np.array_equal(np.asarray(res.state.agents),
                          np.asarray(ref_state.agents))
    for a, b in zip(jax.tree.leaves(res.pstate),
                    jax.tree.leaves(ref_pstate)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_sense_bitwise_matches_unfused():
    dyn = Dynamics()  # eligible: no flow, no deaths, no sense mask
    assert fused_sense_ok(dyn)
    _run_both(dyn)


def test_fused_sense_food_infinite():
    _run_both(Dynamics(food_infinite=True))


def test_fused_sense_mxu_route():
    """Force the MXU mixed-gather route on CPU: still bitwise."""
    from die_tpu.ops.mxu_gather import use_mxu_gather

    # 32x32 field: divisible by 256 for the auto row width
    dyn = Dynamics()
    policy = PhysarumPolicy(max_agents=N, scale=0.01, sense_offset=0.03)
    state = jax.jit(lambda k: init_env_state(k, (32, 32), dyn, N)
                    )(jr.PRNGKey(7))
    pstate = policy.init_state(jr.PRNGKey(8))
    run = lambda s, p: rollout(dyn, policy, None, s, p,  # noqa: E731
                               jr.PRNGKey(9), STEPS)
    native = jax.jit(run)(state, pstate)
    use_mxu_gather(True)
    try:
        jax.clear_caches()
        mxu = jax.jit(run)(state, pstate)
    finally:
        use_mxu_gather(None)
        jax.clear_caches()
    assert np.array_equal(np.asarray(native.rewards),
                          np.asarray(mxu.rewards))
    assert np.array_equal(np.asarray(native.state.medium),
                          np.asarray(mxu.state.medium))


def test_gate_rejects_ineligible_configs():
    for dyn in (Dynamics(agents_die=True),
                Dynamics(apply_sense_mask=True),
                Dynamics(flow=FlowConfig(kind="wave"))):
        assert not fused_sense_ok(dyn)
        _run_both(dyn)  # falls back to the plain path; still correct
