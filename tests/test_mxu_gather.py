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
