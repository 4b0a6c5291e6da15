"""Pallas fused one-hot gather (interpret mode): bit-identical to jnp.take,
including -0.0, subnormal, and NaN-payload cells."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.ops.pallas_gather import pallas_onehot_gather


def _check(flats, idx, **kw):
    outs = jax.jit(lambda f, i: pallas_onehot_gather(
        f, i, interpret=True, **kw))(flats, idx)
    for f, o in zip(flats, outs):
        want = jnp.take(f, idx)
        assert np.array_equal(np.asarray(o).view(np.uint32),
                              np.asarray(want).view(np.uint32))


@pytest.mark.parametrize("m,n", [(65536, 4096), (4096, 1024), (8192, 777)])
def test_matches_take_random(m, n):
    key = jr.PRNGKey(0)
    f1 = jr.normal(key, (m,), jnp.float32)
    f2 = jr.uniform(jr.fold_in(key, 1), (m,), jnp.float32)
    idx = jr.randint(jr.fold_in(key, 2), (n,), 0, m, jnp.int32)
    _check((f1, f2), idx)


def test_exotic_bit_patterns():
    m = 4096
    f = np.zeros(m, np.float32)
    f[0] = -0.0
    f[1] = np.float32(1e-42)            # subnormal
    f[2] = np.float32(np.nan)
    f[3] = -np.float32(np.inf)
    f[4] = np.float32(-1e-40)           # negative subnormal
    f[5:] = np.arange(m - 5, dtype=np.float32)
    idx = jnp.asarray(np.arange(512, dtype=np.int32))
    _check((jnp.asarray(f),), idx)


def test_row_width_variants():
    m = 65536
    f = jr.normal(jr.PRNGKey(3), (m,), jnp.float32)
    idx = jr.randint(jr.PRNGKey(4), (1000,), 0, m, jnp.int32)
    _check((f,), idx, row_width=128)
    _check((f,), idx, row_width=512)


def test_enable_flag_routes_engine_gathers_bitwise():
    """use_pallas_gather(True) reroutes onehot_gather_multi (the exact
    engine's hot gathers) through the fused kernel — a vmapped
    engine-vs-engine trajectory must stay bitwise identical (round-4
    integration, VERDICT r3 item 5)."""
    from die_tpu.core.config import Dynamics
    from die_tpu.core.init import init_env_state
    from die_tpu.models.gradient import PhysarumPolicy
    from die_tpu.ops.mxu_gather import use_mxu_gather
    from die_tpu.ops.pallas_gather import use_pallas_gather
    from die_tpu.parallel.rollout import rollout

    dyn = Dynamics(init_agent_ratio=0.2)
    size = (16, 16)  # 256 cells — row_width-256 divisible
    policy = PhysarumPolicy(max_agents=256, scale=0.01, sense_offset=0.04)
    B = 2
    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(5), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(
        lambda k: init_env_state(k, size, dyn, 256)))(keys)
    pstates = jax.vmap(policy.init_state)(
        jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(6), i))(jnp.arange(B)))
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(7), i))(jnp.arange(B))

    def run():
        res = jax.jit(jax.vmap(
            lambda s, p, k: rollout(dyn, policy, None, s, p, k, 4)))(
            states, pstates, rkeys)
        return (np.asarray(res.rewards),
                np.asarray(res.state.medium), np.asarray(res.state.agents))

    use_mxu_gather(True)  # force the onehot route even on CPU
    try:
        ref = run()
        use_pallas_gather(True)
        got = run()
    finally:
        use_pallas_gather(None)
        use_mxu_gather(None)
    for a, b in zip(ref, got):
        assert np.array_equal(a.view(np.uint32), b.view(np.uint32))
