"""Pallas mega-kernel parity (interpret mode on CPU) and guards."""
import numpy as np
import jax
import jax.random as jr
import pytest

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.pallas_step import make_pallas_step, pallas_fast_rollout
from die_tpu.fast.rollout import fast_rollout

SIZE = (8, 128)


def test_pallas_rollout_matches_xla_bitwise():
    dyn = FastDynamics()
    st = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(5), 5))(st)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s: pallas_fast_rollout(dyn, s, jr.PRNGKey(5), 5,
                                      interpret=True))(st)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    assert np.array_equal(np.asarray(ref_num), np.asarray(pal_num))
    for name, a, b in zip(ref_state._fields, ref_state, pal_state):
        if name == "flow_step":
            continue
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pallas_guards():
    with pytest.raises(ValueError):
        make_pallas_step(FastDynamics(), (24, 24))


def test_pallas_wave_flow_matches_xla():
    from die_tpu.core.config import FlowConfig

    dyn = FastDynamics(flow=FlowConfig(kind="wave", scale=0.5, decay=0.5))
    st = fast_init_jax(jr.PRNGKey(4), SIZE, dyn)
    ref_state, ref_rew, _ = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(6), 4))(st)
    pal_state, pal_rew, _ = jax.jit(
        lambda s: pallas_fast_rollout(dyn, s, jr.PRNGKey(6), 4,
                                      interpret=True))(st)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    assert np.array_equal(np.asarray(ref_state.env_food),
                          np.asarray(pal_state.env_food))
    assert int(ref_state.flow_step) == int(pal_state.flow_step) == 4


def test_pallas_perlin_flow_matches_xla():
    """Perlin flow in the K-step kernel: the fields are precomputed outside
    (jr draws can't lower in Mosaic) and DMA'd per inner step — trajectories
    bitwise-identical to the XLA path."""
    from die_tpu.core.config import FlowConfig
    from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

    dyn = FastDynamics(flow=FlowConfig(kind="perlin", scale=0.4, decay=0.3,
                                       octaves=4, seed=9))
    st = fast_init_jax(jr.PRNGKey(6), SIZE, dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(7), 6))(st)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s: pallas_fast_rollout_multi(dyn, s, jr.PRNGKey(7), 6,
                                            num_inner=3,
                                            interpret=True))(st)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    assert np.array_equal(np.asarray(ref_num), np.asarray(pal_num))
    for name, a, b in zip(ref_state._fields, ref_state, pal_state):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
