"""Independent naive-oracle parity for the fast (lattice) engine.

``die_tpu/fast/rollout.py::oracle_fast_rollout`` runs the SAME ``fast_step``
body on numpy, so it verifies lowering fidelity only.  These tests pin the
step LOGIC itself against ``die_tpu/oracle/fast_naive.py`` — a dict-of-agents
/ per-cell-loop restatement of the semantics sharing only the RNG bit
contract — bitwise, over 4/8/16-direction configs including births, deaths,
and flow, plus fuzzed configs, and one end-to-end tie to the jitted engine.
"""
import dataclasses

import numpy as np
import pytest

from die_tpu.core.config import FlowConfig
from die_tpu.core.rng import np_key
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_np
from die_tpu.fast.rollout import oracle_fast_rollout
from die_tpu.oracle.fast_naive import naive_fast_rollout

SIZE = (16, 16)
STEPS = 10


def assert_trajectory_match(dyn, size=SIZE, steps=STEPS, seed=7, key=11):
    st = fast_init_np(np_key(seed), size, dyn)
    n_state, n_rewards, n_nums = naive_fast_rollout(
        dyn, st, np_key(key), steps)
    e_state, e_rewards, e_nums = oracle_fast_rollout(
        dyn, st, np_key(key), steps)
    np.testing.assert_array_equal(n_rewards, e_rewards)
    np.testing.assert_array_equal(n_nums, e_nums)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        a = np.asarray(getattr(n_state, name))
        b = np.asarray(getattr(e_state, name))
        # bitwise (distinguishes -0.0 / NaN payloads)
        assert np.array_equal(a.view(np.uint32), b.view(np.uint32)), name
    return e_nums


@pytest.mark.parametrize("num_dirs", [4, 8, 16])
def test_naive_matches_engine_defaults(num_dirs):
    assert_trajectory_match(FastDynamics(num_dirs=num_dirs))


@pytest.mark.parametrize("num_dirs", [4, 8, 16])
def test_naive_matches_engine_births(num_dirs):
    dyn = FastDynamics(num_dirs=num_dirs, agents_born=True,
                       birth_threshold=0.2, rate_feed=0.5,
                       food_infinite=True, init_agent_ratio=0.1)
    nums = assert_trajectory_match(dyn, steps=12)
    assert nums[-1] > nums[0], "vacuous: no births occurred"


def test_naive_matches_engine_deaths():
    dyn = FastDynamics(agents_die=True, rate_feed=0.0, cost_move=0.5,
                       deposit_coef=2.0, cost_deposit=0.3)
    nums = assert_trajectory_match(dyn, steps=12)
    assert nums[-1] < nums[0], "vacuous: no deaths occurred"


def test_naive_matches_engine_wave_flow():
    dyn = FastDynamics(flow=FlowConfig(kind="wave", scale=0.5, decay=0.5))
    assert_trajectory_match(dyn)


def test_naive_matches_engine_scalar_priority_and_no_reblock():
    dyn = FastDynamics(per_cell_priority=False, randomize_on_block=False)
    assert_trajectory_match(dyn)


def test_naive_matches_engine_threefry():
    assert_trajectory_match(FastDynamics(rng_kind="threefry"))


def test_naive_matches_engine_fuzz():
    """Seeded random configs across the lattice parameter space."""
    rng = np.random.RandomState(2026)
    for trial in range(6):
        kw = dict(
            num_dirs=int(rng.choice([4, 8, 16])),
            sense_dist=int(rng.randint(1, 5)),
            randomize_on_block=bool(rng.randint(2)),
            per_cell_priority=bool(rng.randint(2)),
            deposit_coef=float(np.float32(rng.uniform(0.0, 6.0))),
            idle_deposit=float(np.float32(rng.uniform(0.0, 0.5))),
            rate_feed=float(np.float32(rng.uniform(0.0, 0.5))),
            cost_move=float(np.float32(rng.uniform(0.0, 0.1))),
            cost_deposit=float(np.float32(rng.uniform(0.0, 0.1))),
            food_infinite=bool(rng.randint(2)),
            agents_die=bool(rng.randint(2)),
            agents_born=bool(rng.randint(2)),
            birth_threshold=float(np.float32(rng.uniform(0.1, 1.0))),
            rng_kind=str(rng.choice(["murmur", "threefry"])),
            init_agent_ratio=float(np.float32(rng.uniform(0.05, 0.4))),
        )
        if rng.randint(2):
            kw["flow"] = FlowConfig(kind="wave",
                                    scale=float(np.float32(rng.uniform(0, 1))),
                                    decay=float(np.float32(rng.uniform(0, 1))))
        dyn = FastDynamics(**kw)
        try:
            assert_trajectory_match(dyn, steps=8, seed=100 + trial,
                                    key=200 + trial)
        except AssertionError as e:
            raise AssertionError(
                f"fuzz trial {trial} diverged: {dataclasses.asdict(dyn)}"
            ) from e


def test_naive_matches_learned_linear_rule():
    """The learned LINEAR turn rule's logic (not just its lowering) pinned
    by the naive per-cell restatement."""
    from die_tpu.fast.learned import (
        make_turn_rule,
        np_init_turn_params,
    )
    from die_tpu.fast.env import fast_step
    from die_tpu.fast.rollout import np_step_bits
    from die_tpu.oracle.fast_naive import naive_fast_rollout, \
        naive_linear_turn

    dyn = FastDynamics()
    params = np_init_turn_params(np_key(21))
    st = fast_init_np(np_key(22), SIZE, dyn)

    # engine on numpy with the rule hook
    rule = make_turn_rule(params)
    e_state = st
    e_rewards = []
    for t in range(8):
        bits = np_step_bits(dyn, np_key(23), t, SIZE)
        e_state, r, _ = fast_step(dyn, e_state, bits, turn_rule=rule)
        e_rewards.append(r)
    n_state, n_rewards, _ = naive_fast_rollout(
        dyn, st, np_key(23), 8, turn_rule_naive=naive_linear_turn(params))
    np.testing.assert_array_equal(np.asarray(e_rewards), n_rewards)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(e_state, name)),
                              np.asarray(getattr(n_state, name))), name


@pytest.mark.parametrize("num_dirs", [8, 16])
def test_naive_matches_learned_mlp_rule(num_dirs):
    """The per-cell MLP turn rule's logic (round 5) pinned by the naive
    per-cell restatement (scalar hardtanh min/max, pinned fold order)."""
    from die_tpu.fast.env import fast_step
    from die_tpu.fast.learned import make_turn_rule, np_init_mlp_params
    from die_tpu.fast.rollout import np_step_bits
    from die_tpu.oracle.fast_naive import naive_fast_rollout, naive_mlp_turn

    dyn = FastDynamics(num_dirs=num_dirs)
    params = np_init_mlp_params(np_key(41), hidden=4)
    size = (8, 8)  # the naive loop is O(W*H*hidden*(feat+act)) Python
    st = fast_init_np(np_key(42), size, dyn)

    rule = make_turn_rule(params)  # shape-dispatches to the MLP family
    e_state = st
    e_rewards = []
    for t in range(5):
        bits = np_step_bits(dyn, np_key(43), t, size)
        e_state, r, _ = fast_step(dyn, e_state, bits, turn_rule=rule)
        e_rewards.append(r)
    n_state, n_rewards, _ = naive_fast_rollout(
        dyn, st, np_key(43), 5, turn_rule_naive=naive_mlp_turn(params))
    np.testing.assert_array_equal(np.asarray(e_rewards), n_rewards)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(e_state, name)),
                              np.asarray(getattr(n_state, name))), name


@pytest.mark.parametrize("num_dirs", [8, 16])
def test_naive_matches_learned_mlp_wide_rule(num_dirs):
    """The WIDE MLP rule (13 features, in-rule probe trios) pinned by the
    naive per-cell restatement, whose probes are direct wrap-indexed
    reads instead of the engine's roll/select machinery."""
    from die_tpu.fast.env import fast_step
    from die_tpu.fast.learned import make_turn_rule, np_init_mlp_wide_params
    from die_tpu.fast.rollout import np_step_bits
    from die_tpu.oracle.fast_naive import naive_fast_rollout, naive_mlp_turn

    dyn = FastDynamics(num_dirs=num_dirs, sense_dist=2)
    params = np_init_mlp_wide_params(np_key(51), hidden=4)
    size = (8, 8)
    st = fast_init_np(np_key(52), size, dyn)

    rule = make_turn_rule(params, dyn)
    e_state = st
    e_rewards = []
    for t in range(5):
        bits = np_step_bits(dyn, np_key(53), t, size)
        e_state, r, _ = fast_step(dyn, e_state, bits, turn_rule=rule)
        e_rewards.append(r)
    n_state, n_rewards, _ = naive_fast_rollout(
        dyn, st, np_key(53), 5,
        turn_rule_naive=naive_mlp_turn(params, dyn))
    np.testing.assert_array_equal(np.asarray(e_rewards), n_rewards)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(e_state, name)),
                              np.asarray(getattr(n_state, name))), name


def test_naive_matches_learned_mlp_ctx_rule():
    """The CTX rule (wide + depthwise-3x3 context) pinned by the naive
    per-cell restatement (direct wrap-indexed 9-tap sums)."""
    from die_tpu.fast.env import fast_step
    from die_tpu.fast.learned import make_turn_rule, init_mlp_ctx_params
    from die_tpu.fast.rollout import np_step_bits
    from die_tpu.oracle.fast_naive import naive_fast_rollout, naive_mlp_turn

    import jax.random as jr

    dyn = FastDynamics(num_dirs=8, sense_dist=2)
    params = np.asarray(init_mlp_ctx_params(jr.PRNGKey(61), hidden=4))
    size = (8, 8)
    st = fast_init_np(np_key(62), size, dyn)

    rule = make_turn_rule(params, dyn)
    e_state = st
    e_rewards = []
    for t in range(4):
        bits = np_step_bits(dyn, np_key(63), t, size)
        e_state, r, _ = fast_step(dyn, e_state, bits, turn_rule=rule)
        e_rewards.append(r)
    n_state, n_rewards, _ = naive_fast_rollout(
        dyn, st, np_key(63), 4,
        turn_rule_naive=naive_mlp_turn(params, dyn))
    np.testing.assert_array_equal(np.asarray(e_rewards), n_rewards)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(e_state, name)),
                              np.asarray(getattr(n_state, name))), name


@pytest.mark.parametrize("num_dirs", [8, 16])
def test_naive_matches_conv_nca_rule(num_dirs):
    """The conv-NCA turn rule's logic pinned by the naive per-cell
    restatement (explicit wrap-indexed 3x3 accumulation)."""
    from die_tpu.fast.env import fast_step
    from die_tpu.fast.nca import make_conv_turn_rule, \
        np_init_conv_turn_params
    from die_tpu.fast.rollout import np_step_bits
    from die_tpu.oracle.fast_naive import naive_conv_turn, \
        naive_fast_rollout

    dyn = FastDynamics(num_dirs=num_dirs)
    params = np_init_conv_turn_params(np_key(31), hidden=4)
    size = (8, 8)  # the naive conv loop is O(W*H*hidden*c*k^2) Python
    st = fast_init_np(np_key(32), size, dyn)

    rule = make_conv_turn_rule(params)
    e_state = st
    e_rewards = []
    for t in range(5):
        bits = np_step_bits(dyn, np_key(33), t, size)
        e_state, r, _ = fast_step(dyn, e_state, bits, turn_rule=rule)
        e_rewards.append(r)
    n_state, n_rewards, _ = naive_fast_rollout(
        dyn, st, np_key(33), 5, turn_rule_naive=naive_conv_turn(params))
    np.testing.assert_array_equal(np.asarray(e_rewards), n_rewards)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(e_state, name)),
                              np.asarray(getattr(n_state, name))), name


def test_naive_ties_to_jitted_engine():
    """Close the chain: naive oracle == fast_step(np) == jitted fast_rollout,
    on one config, end to end."""
    import jax
    import jax.random as jr

    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.rollout import fast_rollout

    dyn = FastDynamics(num_dirs=8, agents_die=True, cost_move=0.05)
    st_np = fast_init_np(np_key(5), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(5), SIZE, dyn)
    n_state, n_rewards, _ = naive_fast_rollout(dyn, st_np, np_key(9), STEPS)
    run = jax.jit(lambda s: fast_rollout(dyn, s, jr.PRNGKey(9), STEPS))
    j_state, j_rewards, _ = run(st_j)
    np.testing.assert_array_equal(n_rewards, np.asarray(j_rewards))
    for a, b in zip(n_state[:-1], j_state[:-1]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
