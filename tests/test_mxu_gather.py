"""MXU one-hot gather: bitwise-identical to jnp.take, and the engine
produces identical trajectories with it enabled."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.ops.mxu_gather import onehot_gather_flat, use_mxu_gather


def test_matches_take_bitwise():
    key = jr.PRNGKey(0)
    flat = jr.uniform(key, (64 * 128,), jnp.float32) * 100 - 50
    idx = jr.randint(jr.fold_in(key, 1), (5000,), 0, flat.shape[0], jnp.int32)
    ref = jnp.take(flat, idx)
    out = jax.jit(onehot_gather_flat)(flat, idx)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_engine_trajectory_identical_with_mxu_gather():
    from die_tpu.core.config import Dynamics
    from die_tpu.core.init import init_env_state
    from die_tpu.models.gradient import PhysarumPolicy
    from die_tpu.parallel.rollout import rollout

    dyn = Dynamics()
    policy = PhysarumPolicy(max_agents=256, scale=0.01, sense_offset=0.04)
    state = init_env_state(jr.PRNGKey(1), (16, 16), dyn, 256)
    pstate = policy.init_state(jr.PRNGKey(2))

    def run():
        return jax.jit(lambda s, p: rollout(dyn, policy, None, s, p,
                                            jr.PRNGKey(3), 8))(state, pstate)

    use_mxu_gather(False)
    try:
        ref = run()
        use_mxu_gather(True)
        jax.clear_caches()
        alt = run()
    finally:
        use_mxu_gather(None)  # restore auto (TPU-only default)
        jax.clear_caches()
    assert np.array_equal(np.asarray(ref.rewards), np.asarray(alt.rewards))
    assert np.array_equal(np.asarray(ref.state.agents),
                          np.asarray(alt.state.agents))


def test_multi_matches_take_bitwise():
    from die_tpu.ops.mxu_gather import onehot_gather_multi

    key = jr.PRNGKey(4)
    f1 = jr.uniform(key, (64 * 128,), jnp.float32) * 100 - 50
    f2 = jr.uniform(jr.fold_in(key, 1), (64 * 128,), jnp.float32)
    idx = jr.randint(jr.fold_in(key, 2), (5000,), 0, f1.shape[0], jnp.int32)
    o1, o2 = jax.jit(onehot_gather_multi)((f1, f2), idx)
    assert np.array_equal(np.asarray(jnp.take(f1, idx)), np.asarray(o1))
    assert np.array_equal(np.asarray(jnp.take(f2, idx)), np.asarray(o2))


def test_byte_planes_exact_all_patterns():
    """The byte-plane gather is bit-exact for every f32 pattern: +-0,
    subnormals (chem diffusion tails really decay below 1e-38), NaN, inf."""
    import struct

    from die_tpu.ops.mxu_gather import onehot_gather_flat

    specials = np.array([0.0, -0.0, 1e-38, 1e-44, -3e-39, np.inf, -np.inf,
                         np.nan, 3.0e38, -1.5, 1e-30], np.float32)
    f = np.asarray(jr.uniform(jr.PRNGKey(9), (64 * 128,), jnp.float32)) * 10
    f[: specials.shape[0] * 100] = np.tile(specials, 100)[
        : specials.shape[0] * 100]
    f = jnp.asarray(f)
    idx = jr.randint(jr.PRNGKey(10), (4096,), 0, f.shape[0], jnp.int32)
    out = jax.jit(onehot_gather_flat)(f, idx)
    ref = jnp.take(f, idx)
    a = np.asarray(out).view(np.uint32)
    b = np.asarray(ref).view(np.uint32)
    assert np.array_equal(a, b)  # BIT equality, not value equality


def test_multi_preserves_zero_signs():
    """onehot_gather_multi reproduces jnp.take bit-for-bit including -0.0
    cells (which atan2 observes -- Physarum's dead-gradient semantics,
    core/agent/gradient.py:177-181)."""
    from die_tpu.ops.mxu_gather import onehot_gather_multi

    key = jr.PRNGKey(9)
    f = jr.uniform(key, (64 * 128,), jnp.float32) * 10 - 5
    f = f.at[0:200].set(np.float32(-0.0)).at[200:400].set(np.float32(0.0))
    idx = jr.randint(jr.fold_in(key, 1), (4096,), 0, f.shape[0], jnp.int32)
    (out,) = jax.jit(onehot_gather_multi)((f,), idx)
    ref = jnp.take(f, idx)
    a = np.asarray(out).view(np.uint32)
    b = np.asarray(ref).view(np.uint32)
    assert np.array_equal(a, b)
