"""Learned linear turn rule inside the Pallas K-step kernel (round 4).

The params ride as an SMEM operand (die_tpu/fast/pallas_step.py
``learned=True``), so one compiled kernel serves an entire ES population.
Interpret-mode bitwise parity vs the XLA scan and the NumPy oracle; the
real-chip run is measured in tools/tpu_parity.py (`fast_pallas_learned`)
and docs/PARITY.md.
"""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax, fast_init_np
from die_tpu.fast.learned import (
    init_turn_params,
    learned_fast_rollout,
    learned_fast_rollout_auto,
    np_init_turn_params,
    oracle_learned_rollout,
)
from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

SIZE = (8, 128)


def _assert_states_equal(a_state, b_state):
    for name, a, b in zip(a_state._fields, a_state, b_state):
        if name == "flow_step":
            continue
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pallas_learned_matches_xla_bitwise():
    dyn = FastDynamics()
    params = init_turn_params(jr.PRNGKey(7))
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 6))(
        st, params)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 6, num_inner=3, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    assert np.array_equal(np.asarray(ref_num), np.asarray(pal_num))
    _assert_states_equal(ref_state, pal_state)


def test_pallas_learned_matches_numpy_oracle():
    dyn = FastDynamics()
    from die_tpu.core.rng import np_key

    np_params = np_init_turn_params(np_key(7))
    params = init_turn_params(jr.PRNGKey(7))
    assert np.array_equal(np_params, np.asarray(params))

    st_np = fast_init_np(np_key(3), SIZE, dyn)
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    o_state, o_rew, o_num = oracle_learned_rollout(
        dyn, np_params, st_np, np_key(5), 4)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 4, num_inner=4, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(o_rew, np.asarray(pal_rew))
    assert np.array_equal(o_num, np.asarray(pal_num))
    _assert_states_equal(o_state, pal_state)


def test_pallas_learned_population_vmap():
    """vmap over (params, envs) — the ES-generation shape: every candidate
    bitwise-matches its own XLA-scan rollout with no recompilation."""
    dyn = FastDynamics()
    pop = 3
    params = jax.vmap(lambda i: init_turn_params(jr.fold_in(
        jr.PRNGKey(9), i)))(jnp.arange(pop))
    states = jax.vmap(lambda i: fast_init_jax(jr.fold_in(
        jr.PRNGKey(3), i), SIZE, dyn))(jnp.arange(pop))
    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(5), i))(jnp.arange(pop))

    _, ref_rew, _ = jax.jit(jax.vmap(
        lambda p, s, k: learned_fast_rollout(dyn, p, s, k, 4)))(
        params, states, keys)
    _, pal_rew, _ = jax.jit(jax.vmap(
        lambda p, s, k: pallas_fast_rollout_multi(
            dyn, s, k, 4, num_inner=4, interpret=True, turn_params=p)))(
        params, states, keys)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))


def test_pallas_learned_16dir_matches_xla_bitwise():
    from die_tpu.fast.config import tuned_dynamics

    dyn = tuned_dynamics(16)
    params = init_turn_params(jr.PRNGKey(7))
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    ref_state, ref_rew, _ = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 4))(
        st, params)
    pal_state, pal_rew, _ = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 4, num_inner=2, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    _assert_states_equal(ref_state, pal_state)


def test_train_lattice_auto_smoke():
    """train_lattice routes through learned_fast_rollout_auto — off-TPU it
    must keep training bitwise as before (XLA scan path)."""
    from die_tpu.fast.learned import LatticeTrainConfig, train_lattice

    dyn = FastDynamics()
    cfg = LatticeTrainConfig(field_size=(8, 128), epochs=2, epoch_iters=3,
                             popsize=4, envs_per_eval=2, seed=0)
    best, _, history = train_lattice(dyn, cfg)
    assert best.shape == (3, 7)
    assert len(history) == 2


def test_pallas_learned_banded_matches_xla_bitwise():
    from die_tpu.fast.pallas_step import pallas_banded_rollout

    dyn = FastDynamics()
    params = init_turn_params(jr.PRNGKey(7))
    st = fast_init_jax(jr.PRNGKey(3), (64, 128), dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 4))(
        st, params)
    ban_state, ban_rew, ban_num = jax.jit(
        lambda s, p: pallas_banded_rollout(
            dyn, s, jr.PRNGKey(5), 4, num_bands=2, interpret=True,
            turn_params=p))(st, params)
    # states bitwise; rewards equal up to the documented band-order fp32
    # fold (tests/test_banded.py convention); agent counts exact (int32)
    np.testing.assert_allclose(np.asarray(ref_rew), np.asarray(ban_rew),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(ref_num), np.asarray(ban_num))
    _assert_states_equal(ref_state, ban_state)


def test_learned_auto_routes_off_tpu():
    """Off-TPU the auto wrapper must take the XLA scan (and agree)."""
    dyn = FastDynamics()
    params = init_turn_params(jr.PRNGKey(7))
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    a_state, a_rew, _ = jax.jit(
        lambda s, p: learned_fast_rollout_auto(dyn, p, s, jr.PRNGKey(5), 5))(
        st, params)
    r_state, r_rew, _ = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 5))(
        st, params)
    assert np.array_equal(np.asarray(a_rew), np.asarray(r_rew))
    _assert_states_equal(a_state, r_state)


def test_pallas_mlp_matches_xla_bitwise():
    """The per-cell MLP rule (round 5) inside the K-step kernel — the
    params SMEM operand shape-dispatches to the MLP family."""
    from die_tpu.fast.learned import init_mlp_params

    dyn = FastDynamics()
    params = init_mlp_params(jr.PRNGKey(7))
    assert params.shape == (11, 9)
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 6))(
        st, params)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 6, num_inner=3, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    assert np.array_equal(np.asarray(ref_num), np.asarray(pal_num))
    _assert_states_equal(ref_state, pal_state)


def test_pallas_mlp_matches_numpy_oracle():
    from die_tpu.core.rng import np_key
    from die_tpu.fast.learned import init_mlp_params, np_init_mlp_params

    dyn = FastDynamics()
    np_params = np_init_mlp_params(np_key(7))
    params = init_mlp_params(jr.PRNGKey(7))
    assert np.array_equal(np_params, np.asarray(params))

    st_np = fast_init_np(np_key(3), SIZE, dyn)
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    o_state, o_rew, o_num = oracle_learned_rollout(
        dyn, np_params, st_np, np_key(5), 4)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 4, num_inner=4, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(o_rew, np.asarray(pal_rew))
    assert np.array_equal(o_num, np.asarray(pal_num))
    _assert_states_equal(o_state, pal_state)


def test_pallas_mlp_16dir_matches_xla_bitwise():
    from die_tpu.fast.config import tuned_dynamics
    from die_tpu.fast.learned import jones_mimic_mlp_params

    dyn = tuned_dynamics(16)
    params = jnp.asarray(jones_mimic_mlp_params())
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    ref_state, ref_rew, _ = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 4))(
        st, params)
    pal_state, pal_rew, _ = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 4, num_inner=2, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    _assert_states_equal(ref_state, pal_state)


def test_pallas_mlp_banded_matches_xla_bitwise():
    from die_tpu.fast.learned import init_mlp_params
    from die_tpu.fast.pallas_step import pallas_banded_rollout

    dyn = FastDynamics()
    params = init_mlp_params(jr.PRNGKey(7), hidden=4)
    st = fast_init_jax(jr.PRNGKey(3), (64, 128), dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 4))(
        st, params)
    ban_state, ban_rew, ban_num = jax.jit(
        lambda s, p: pallas_banded_rollout(
            dyn, s, jr.PRNGKey(5), 4, num_bands=2, interpret=True,
            turn_params=p))(st, params)
    np.testing.assert_allclose(np.asarray(ref_rew), np.asarray(ban_rew),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(ref_num), np.asarray(ban_num))
    _assert_states_equal(ref_state, ban_state)


def test_mlp_mimic_matches_jones_on_strict_orderings():
    """jones_mimic_mlp_params reproduces the Jones argmax wherever the
    ordering is strict (the warm start for kernel-speed MLP training);
    hardtanh(0) == 0 exactly, so the all-tie state keeps at keep_eps=0."""
    from die_tpu.fast.env import FastEnvState
    from die_tpu.fast.learned import jones_mimic_mlp_params, make_turn_rule

    rule = make_turn_rule(jones_mimic_mlp_params())
    rng = np.random.default_rng(42)
    W = H = 32
    st = FastEnvState(*[rng.uniform(0, 1, (W, H)).astype(np.float32)
                        for _ in range(len(FastEnvState._fields))])
    left, fwd, right = [rng.uniform(0, 5, (W, H)).astype(np.float32)
                        for _ in range(3)]
    turn = np.asarray(rule(np, left, fwd, right, st, None))
    keep = (fwd >= left) & (fwd >= right)
    jones = np.where(keep, 0.0, np.where(left > right, 1.0,
                     np.where(right > left, -1.0, np.nan))).astype(np.float32)
    strict = ~np.isnan(jones)
    agree = (turn[strict] == jones[strict]).mean()
    assert agree >= 0.99, agree
    zero = np.zeros((W, H), np.float32)
    assert np.all(np.asarray(rule(np, zero, zero, zero, st, None)) == 0.0)


def test_pallas_mlp_wide_matches_xla_bitwise():
    """The WIDE MLP family (13 features, in-rule probe trios) inside the
    K-step kernel — probes use the engine's own roll machinery, so the
    kernel, XLA scan, and oracle stay bitwise."""
    from die_tpu.fast.learned import init_mlp_wide_params

    dyn = FastDynamics()
    params = init_mlp_wide_params(jr.PRNGKey(7))
    assert params.shape == (11, 14)
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    ref_state, ref_rew, _ = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 6))(
        st, params)
    pal_state, pal_rew, _ = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 6, num_inner=3, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    _assert_states_equal(ref_state, pal_state)


def test_pallas_mlp_wide_16dir_matches_oracle():
    from die_tpu.core.rng import np_key
    from die_tpu.fast.config import tuned_dynamics
    from die_tpu.fast.learned import (
        init_mlp_wide_params,
        np_init_mlp_wide_params,
    )

    dyn = tuned_dynamics(16)
    np_params = np_init_mlp_wide_params(np_key(7))
    params = init_mlp_wide_params(jr.PRNGKey(7))
    assert np.array_equal(np_params, np.asarray(params))

    st_np = fast_init_np(np_key(3), SIZE, dyn)
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    o_state, o_rew, _ = oracle_learned_rollout(
        dyn, np_params, st_np, np_key(5), 4)
    pal_state, pal_rew, _ = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 4, num_inner=2, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(o_rew, np.asarray(pal_rew))
    _assert_states_equal(o_state, pal_state)


def test_mlp_wide_mimic_matches_jones_on_strict_orderings():
    """The wide mimic reads only the chem@S trio, so it reproduces the
    Jones argmax exactly like the plain mimic."""
    from die_tpu.fast.env import FastEnvState
    from die_tpu.fast.learned import (
        jones_mimic_mlp_wide_params,
        make_turn_rule,
    )

    dyn = FastDynamics()
    rule = make_turn_rule(jones_mimic_mlp_wide_params(), dyn)
    rng = np.random.default_rng(42)
    W = H = 32
    fields = [rng.uniform(0, 1, (W, H)).astype(np.float32)
              for _ in range(len(FastEnvState._fields))]
    fields[1] = np.floor(fields[1] * 8)  # dir must be a valid lattice dir
    st = FastEnvState(*fields)
    left, fwd, right = [rng.uniform(0, 5, (W, H)).astype(np.float32)
                        for _ in range(3)]
    turn = np.asarray(rule(np, left, fwd, right, st, None))
    keep = (fwd >= left) & (fwd >= right)
    jones = np.where(keep, 0.0, np.where(left > right, 1.0,
                     np.where(right > left, -1.0, np.nan))).astype(np.float32)
    strict = ~np.isnan(jones)
    agree = (turn[strict] == jones[strict]).mean()
    assert agree >= 0.99, agree


def test_pallas_mlp_ctx_matches_xla_bitwise():
    """The CTX family (wide + depthwise-3x3 context, 20 features) inside
    the K-step kernel."""
    from die_tpu.fast.learned import init_mlp_ctx_params

    dyn = FastDynamics()
    params = init_mlp_ctx_params(jr.PRNGKey(7))
    assert params.shape == (18, 21)
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    ref_state, ref_rew, _ = jax.jit(
        lambda s, p: learned_fast_rollout(dyn, p, s, jr.PRNGKey(5), 6))(
        st, params)
    pal_state, pal_rew, _ = jax.jit(
        lambda s, p: pallas_fast_rollout_multi(
            dyn, s, jr.PRNGKey(5), 6, num_inner=3, interpret=True,
            turn_params=p))(st, params)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    _assert_states_equal(ref_state, pal_state)


def test_ctx_embedding_of_wide_is_exact():
    """embed_wide_into_ctx lifts a wide params array into the ctx layout
    with zero taps — the ctx rollout must be BITWISE identical to the
    wide rollout (the 755.96 record becomes an exact warm start)."""
    from die_tpu.fast.config import tuned_dynamics
    from die_tpu.fast.learned import (
        embed_wide_into_ctx,
        init_mlp_wide_params,
    )

    dyn = tuned_dynamics(16)
    wide = init_mlp_wide_params(jr.PRNGKey(3))
    ctx = jnp.asarray(embed_wide_into_ctx(np.asarray(wide)))
    st = fast_init_jax(jr.PRNGKey(4), SIZE, dyn)
    w_state, w_rew, _ = jax.jit(
        lambda s: learned_fast_rollout(dyn, wide, s, jr.PRNGKey(5), 6))(st)
    c_state, c_rew, _ = jax.jit(
        lambda s: learned_fast_rollout(dyn, ctx, s, jr.PRNGKey(5), 6))(st)
    assert np.array_equal(np.asarray(w_rew), np.asarray(c_rew))
    _assert_states_equal(w_state, c_state)


def test_mlp_wide_needs_dyn():
    from die_tpu.fast.learned import jones_mimic_mlp_wide_params, \
        make_turn_rule

    with pytest.raises(ValueError):
        make_turn_rule(jones_mimic_mlp_wide_params())


def test_train_lattice_mlp_smoke():
    """train_lattice trains the MLP family when params_init has the MLP
    shape; best params come back in that shape."""
    from die_tpu.fast.learned import (
        LatticeTrainConfig,
        init_mlp_params,
        train_lattice,
    )

    dyn = FastDynamics(food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=2, epoch_iters=3,
                             popsize=4, envs_per_eval=1, seed=0)
    p0 = init_mlp_params(jr.PRNGKey(0), hidden=4)
    best, _, history = train_lattice(dyn, cfg, params_init=p0)
    assert best.shape == p0.shape
    assert len(history) == 2
    assert all(np.isfinite(h["best"]) for h in history)


def test_chunk_turn_params_guard():
    from die_tpu.fast.pallas_step import make_pallas_multi_step

    dyn = FastDynamics()
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    keys = jnp.zeros((2, 2), jnp.uint32)
    chunk = make_pallas_multi_step(dyn, SIZE, 2, interpret=True,
                                   learned=True)
    with pytest.raises(ValueError):
        chunk(st, keys)  # learned=True needs turn_params
    chunk2 = make_pallas_multi_step(dyn, SIZE, 2, interpret=True)
    with pytest.raises(ValueError):
        chunk2(st, keys, turn_params=init_turn_params(jr.PRNGKey(0)))
