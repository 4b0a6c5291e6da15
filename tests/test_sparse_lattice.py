"""Sparse (agent-list) engine vs field-centric fast engine: bitwise parity.

The sparse engine (die_tpu/fast/sparse.py) is the round-3 A/B formulation
for the headline throughput question.  Its dynamics must be EXACTLY the
field engine's on the supported scope — same per-cell murmur stream, same
turn rule, same conflict winner, same deposit/feed/flow/diffuse arithmetic
— so the A/B measures formulation cost, not different dynamics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core.config import FlowConfig
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.rollout import fast_rollout
from die_tpu.fast.sparse import (
    from_fast,
    sparse_rollout,
    to_field_views,
)

SIZE = (16, 16)
STEPS = 12


def assert_sparse_matches_fast(dyn, seed=7, key=11, steps=STEPS, size=SIZE):
    st_f = fast_init_jax(jr.PRNGKey(seed), size, dyn)
    st_s = from_fast(st_f)
    run_f = jax.jit(lambda s: fast_rollout(dyn, s, jr.PRNGKey(key), steps))
    run_s = jax.jit(lambda s: sparse_rollout(dyn, s, jr.PRNGKey(key), steps))
    f_state, f_rewards, f_nums = run_f(st_f)
    s_state, s_rewards, s_nums = run_s(jax.tree.map(jnp.asarray, st_s))

    np.testing.assert_array_equal(np.asarray(f_nums), np.asarray(s_nums))
    np.testing.assert_array_equal(np.asarray(f_rewards),
                                  np.asarray(s_rewards))
    occ_s, dir_s, food_s = jax.jit(to_field_views)(s_state)
    occ_f = np.asarray(f_state.occ)
    assert np.array_equal(occ_f, np.asarray(occ_s))
    assert np.array_equal(np.asarray(f_state.env_food),
                          np.asarray(s_state.env_food))
    assert np.array_equal(np.asarray(f_state.chem),
                          np.asarray(s_state.chem))
    # dir/food compared at occupied cells (the field engine lets empty
    # cells' values drift; the sparse engine has no empty-cell state)
    m = occ_f > 0
    assert np.array_equal(np.asarray(f_state.dir)[m],
                          np.asarray(dir_s)[m])
    f_food = np.asarray(f_state.agent_food)[m]
    s_food = np.asarray(food_s)[m]
    assert np.array_equal(f_food.view(np.uint32), s_food.view(np.uint32))


@pytest.mark.parametrize("num_dirs", [4, 8, 16])
def test_sparse_matches_fast_defaults(num_dirs):
    assert_sparse_matches_fast(FastDynamics(num_dirs=num_dirs))


def test_sparse_matches_fast_no_reblock():
    assert_sparse_matches_fast(FastDynamics(randomize_on_block=False))


def test_sparse_matches_fast_wave_flow():
    assert_sparse_matches_fast(
        FastDynamics(flow=FlowConfig(kind="wave", scale=0.5, decay=0.5)))


def test_sparse_matches_fast_config_variants():
    assert_sparse_matches_fast(
        FastDynamics(sense_dist=5, idle_deposit=0.25, deposit_coef=2.0,
                     rate_feed=0.2, cost_move=0.02, food_infinite=True,
                     init_agent_ratio=0.3))


def test_sparse_matches_fast_dense_and_sparse_occupancy():
    # high contention (40%) and near-empty (2%) regimes
    assert_sparse_matches_fast(FastDynamics(init_agent_ratio=0.4), seed=3)
    assert_sparse_matches_fast(FastDynamics(init_agent_ratio=0.02), seed=5)


def test_sparse_scope_guard():
    from die_tpu.fast.sparse import sparse_step

    st_f = fast_init_jax(jr.PRNGKey(0), SIZE, FastDynamics())
    st_s = from_fast(st_f)
    for dyn in (FastDynamics(agents_die=True),
                FastDynamics(agents_born=True),
                FastDynamics(rng_kind="threefry"),
                FastDynamics(per_cell_priority=False)):
        with pytest.raises(NotImplementedError):
            sparse_step(dyn, jax.tree.map(jnp.asarray, st_s),
                        jnp.uint32(0), jnp.uint32(1))


def test_sparse_mxu_route_matches_native():
    """Force the MXU one-hot gather/scatter route on CPU: must be bitwise
    equal to the native take/at[] route (the formulations are exact)."""
    from die_tpu.ops.mxu_gather import use_mxu_gather

    dyn = FastDynamics()
    st_f = fast_init_jax(jr.PRNGKey(9), SIZE, dyn)
    st_s = jax.tree.map(jnp.asarray, from_fast(st_f))
    run = lambda s: sparse_rollout(dyn, s, jr.PRNGKey(13), 6)  # noqa: E731
    native = jax.jit(run)(st_s)
    use_mxu_gather(True)
    try:
        jax.clear_caches()
        mxu = jax.jit(run)(st_s)
    finally:
        use_mxu_gather(None)
        jax.clear_caches()
    for a, b in zip(jax.tree.leaves(native), jax.tree.leaves(mxu)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
