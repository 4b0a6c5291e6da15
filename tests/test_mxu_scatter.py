"""MXU one-hot scatter: bitwise-identical to the at[].set winner scatter,
and the engine produces identical trajectories with it enabled.

The scatter replaces the reference's duplicate-drop fancy-index ``+=``
semantics (reference core/env.py:211-215) on the TPU hot path; the sort
upstream guarantees at most one winner per cell.
"""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.ops.mxu_gather import use_mxu_gather
from die_tpu.ops.mxu_scatter import onehot_scatter_winner


def _ref_scatter(values, cells, mask, hw):
    dense = jnp.zeros((hw,), jnp.float32).at[
        jnp.where(mask, cells, hw)].set(values, mode="drop",
                                        unique_indices=True)
    count = jnp.zeros((hw,), jnp.float32).at[
        jnp.where(mask, cells, hw)].set(jnp.ones_like(values), mode="drop",
                                        unique_indices=True)
    return dense, count


def test_matches_set_bitwise():
    key = jr.PRNGKey(0)
    hw, n = 64 * 128, 5000
    # unique winner cells: a permutation prefix
    cells = jr.permutation(key, hw)[:n].astype(jnp.int32)
    values = jr.uniform(jr.fold_in(key, 1), (n,), jnp.float32) * 100 - 50
    mask = jr.uniform(jr.fold_in(key, 2), (n,)) < 0.3
    dense, count = jax.jit(
        lambda v, c, m: onehot_scatter_winner(v, c, m, hw))(
        values, cells, mask)
    rdense, rcount = _ref_scatter(values, cells, mask, hw)
    assert np.array_equal(np.asarray(dense).view(np.uint32),
                          np.asarray(rdense).view(np.uint32))
    assert np.array_equal(np.asarray(count), np.asarray(rcount))


def test_special_patterns_exact():
    """Winner placement is bit-exact for every f32 pattern: +-0, subnormals,
    NaN, inf (deposits really reach subnormals via food decay tails)."""
    hw = 32 * 128
    specials = np.array([0.0, -0.0, 1e-38, 1e-44, -3e-39, np.inf, -np.inf,
                         np.nan, 3.0e38, -1.5, 1e-30], np.float32)
    n = 1024
    values = jnp.asarray(np.tile(specials, n // specials.shape[0] + 1)[:n])
    cells = jr.permutation(jr.PRNGKey(3), hw)[:n].astype(jnp.int32)
    mask = jnp.ones((n,), bool)
    dense, count = jax.jit(
        lambda v, c, m: onehot_scatter_winner(v, c, m, hw))(
        values, cells, mask)
    rdense, _ = _ref_scatter(values, cells, mask, hw)
    assert np.array_equal(np.asarray(dense).view(np.uint32),
                          np.asarray(rdense).view(np.uint32))


def test_masked_rows_ignore_out_of_range_cells():
    """Masked-out rows may carry any cell value (the packed deposit path
    leaves dead slots at the pseudo-cell) — they must contribute nothing."""
    hw = 16 * 128
    cells = jnp.array([5, hw - 1, 70000, -1, 5], jnp.int32)
    values = jnp.array([1.5, 2.5, 99.0, 99.0, 99.0], jnp.float32)
    mask = jnp.array([True, True, False, False, False])
    dense, count = jax.jit(
        lambda v, c, m: onehot_scatter_winner(v, c, m, hw))(
        values, cells, mask)
    d = np.asarray(dense)
    assert d[5] == np.float32(1.5) and d[hw - 1] == np.float32(2.5)
    assert float(np.abs(d).sum()) == 4.0
    assert float(np.asarray(count).sum()) == 2.0


def test_engine_trajectory_identical_with_mxu_scatter():
    """Engine trajectories are bitwise identical with the MXU scatter+gather
    forced on vs the native at[].set / jnp.take path (16x16 field: the
    packed-key deposit branch with hw < 2^16)."""
    from die_tpu.core.config import Dynamics
    from die_tpu.core.init import init_env_state
    from die_tpu.models.gradient import PhysarumPolicy
    from die_tpu.parallel.rollout import rollout

    dyn = Dynamics(agents_die=True)
    policy = PhysarumPolicy(max_agents=256, scale=0.01, sense_offset=0.04)
    state = init_env_state(jr.PRNGKey(1), (16, 16), dyn, 256)
    pstate = policy.init_state(jr.PRNGKey(2))

    def run():
        return jax.jit(lambda s, p: rollout(dyn, policy, None, s, p,
                                            jr.PRNGKey(3), 8))(state, pstate)

    use_mxu_gather(False)
    try:
        ref = run()
        use_mxu_gather(True)  # also routes the scatter (shared switch)
        jax.clear_caches()
        alt = run()
    finally:
        use_mxu_gather(None)
        jax.clear_caches()
    assert np.array_equal(np.asarray(ref.rewards), np.asarray(alt.rewards))
    assert np.array_equal(np.asarray(ref.state.agents).view(np.uint32),
                          np.asarray(alt.state.agents).view(np.uint32))
    assert np.array_equal(np.asarray(ref.state.medium).view(np.uint32),
                          np.asarray(alt.state.medium).view(np.uint32))
