"""Stable-fallback deposit scatter coverage (core/env.py::_deposit_and_layout).

The packed unique-key formulation only applies when the field has <= 2^16
cells AND the agent array has <= 2^16 slots; larger geometries take the
stable-sort fallback.  Reference semantics both must honor: numpy buffered
fancy-index ``+=`` — one deposit per cell, last (highest-slot alive) write
wins (/root/reference/core/env.py:211-215).

These tests drive the fallback three ways: a real > 2^16-cell field
(512 x 136), a > 2^16 slot count on a small field, and the
``force_stable_scatter`` testing knob that lets small-size runs (and the
fuzz suite, tests/test_fuzz_parity.py) exercise the branch directly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.env import env_step
from die_tpu.core.init import init_env_state
from die_tpu.core.rng import np_key, np_random_bits, uniform01_from_bits
from die_tpu.oracle.env import oracle_env_step, oracle_init_state


def _random_action(seed, n, scale=0.05, dep=0.6):
    bits = np_random_bits(np_key(seed), (3, n))
    u = uniform01_from_bits(bits)
    a = ((u - np.float32(0.5)) * np.float32(2 * scale)).astype(np.float32)
    a[2] = (u[2] * np.float32(dep)).astype(np.float32)
    return a


def _assert_trajectory(dyn, size, n, steps=3, seed=17):
    os_ = oracle_init_state(np_key(seed), size, dyn, n)
    js = jax.jit(lambda k: init_env_state(k, size, dyn, n))(jr.PRNGKey(seed))
    step = jax.jit(lambda s, a: env_step(dyn, s, a))
    for t in range(steps):
        action = _random_action(900 + t, n)
        js, jinfo = step(js, jnp.asarray(action))
        os_, reward, _ = oracle_env_step(dyn, os_, action)
        assert np.array_equal(np.asarray(js.medium), os_.medium), t
        assert np.array_equal(np.asarray(js.agents), os_.agents), t
        assert np.asarray(jinfo.reward) == reward, t
    return js


def test_large_field_takes_fallback_and_matches_oracle():
    """512 x 136 = 69,632 cells > 2^16: the engine must route to the
    stable-sort fallback (no force flag) and stay bitwise with the oracle."""
    dyn = Dynamics(init_agent_ratio=0.15)
    _assert_trajectory(dyn, (512, 136), n=4096, steps=3)


def test_large_slot_count_takes_fallback_and_matches_oracle():
    """Slot count > 2^16 on a small field: the n-side trigger of the
    fallback condition."""
    dyn = Dynamics(init_agent_ratio=0.3)
    _assert_trajectory(dyn, (16, 16), n=(1 << 16) + 64, steps=3)


def test_forced_fallback_bitwise_equals_packed():
    """The two formulations are interchangeable by contract: the same
    trajectory, bit for bit, packed vs forced-stable — and both match the
    oracle (the force knob is honored at small sizes)."""
    size, n, steps, seed = (24, 20), 256, 4, 5
    packed = Dynamics()
    forced = Dynamics(force_stable_scatter=True)
    js_p = jax.jit(lambda k: init_env_state(k, size, packed, n)
                   )(jr.PRNGKey(seed))
    js_f = js_p
    os_ = oracle_init_state(np_key(seed), size, forced, n)
    step_p = jax.jit(lambda s, a: env_step(packed, s, a))
    step_f = jax.jit(lambda s, a: env_step(forced, s, a))
    for t in range(steps):
        action = _random_action(700 + t, n)
        js_p, _ = step_p(js_p, jnp.asarray(action))
        js_f, _ = step_f(js_f, jnp.asarray(action))
        os_, _, _ = oracle_env_step(forced, os_, action)
        assert np.array_equal(np.asarray(js_p.medium),
                              np.asarray(js_f.medium)), t
        assert np.array_equal(np.asarray(js_p.agents),
                              np.asarray(js_f.agents)), t
        assert np.array_equal(np.asarray(js_f.medium), os_.medium), t


def test_fallback_duplicate_drop_last_write_wins():
    """Constructed collision on the fallback path: K alive agents on one
    cell -> exactly the highest-slot agent's deposit lands (stable sort
    keeps slot order within the equal-cell run)."""
    from die_tpu.core.env import _deposit_and_layout

    dyn = Dynamics(force_stable_scatter=True)
    W, H, n = 8, 8, 6
    agents = np.zeros((4, n), np.float32)
    action = np.zeros((3, n), np.float32)
    # slots 1, 2, 4 alive at the same cell; slot 5 dead there with a huge
    # deposit (must be ignored); slot 0 alive at (0,0)
    for slot, (xy, alive, dep) in {
        0: (0.0, 1.0, 0.25),
        1: (0.5, 1.0, 1.0),
        2: (0.5, 1.0, 2.0),
        4: (0.5, 1.0, 3.0),   # winner: highest alive slot on the cell
        5: (0.5, 0.0, 99.0),
    }.items():
        agents[ch.CH_AGT_X, slot] = xy
        agents[ch.CH_AGT_Y, slot] = xy
        agents[ch.CH_AGT_ALIVE, slot] = alive
        action[ch.CH_ACT_DEPOSIT, slot] = dep
    medium = np.zeros((3, W, H), np.float32)
    out = jax.jit(lambda m, a, act: _deposit_and_layout(dyn, m, a, act))(
        jnp.asarray(medium), jnp.asarray(agents), jnp.asarray(action))
    chem = np.asarray(out[ch.CH_MED_CHEM])
    occ = np.asarray(out[ch.CH_MED_AGENTS])
    cxy = round(0.5 * (W - 1))
    assert chem[cxy, cxy] == np.float32(3.0)
    assert chem[0, 0] == np.float32(0.25)
    assert occ.sum() == 2.0
