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


def _assert_states_equal(ref_state, pal_state, skip_flow=False):
    for name, a, b in zip(ref_state._fields, ref_state, pal_state):
        if skip_flow and name == "flow_step":
            continue
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


@pytest.mark.parametrize("dyn", [
    None,  # tuned_dynamics(16) — constructed lazily below
    FastDynamics(num_dirs=16, agents_born=True, agents_die=True,
                 birth_threshold=0.5),
])
def test_pallas_16dir_dynloop_matches_xla(dyn):
    """The 16-direction kernel path (lax.fori_loop + dynamic rotates — the
    round-4 VMEM restructure) is bitwise-identical to the XLA lowmem path,
    including births/deaths."""
    from die_tpu.fast.config import tuned_dynamics
    from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

    if dyn is None:
        dyn = tuned_dynamics(16)
    st = fast_init_jax(jr.PRNGKey(8), (16, 128), dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(9), 4))(st)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s: pallas_fast_rollout_multi(dyn, s, jr.PRNGKey(9), 4,
                                            num_inner=2, interpret=True))(st)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(pal_rew))
    assert np.array_equal(np.asarray(ref_num), np.asarray(pal_num))
    _assert_states_equal(ref_state, pal_state, skip_flow=True)


def test_pallas_16dir_banded_matches_xla():
    """The banded kernel on the 16-direction dynloop path."""
    from die_tpu.fast.config import tuned_dynamics
    from die_tpu.fast.pallas_step import pallas_banded_rollout

    dyn = tuned_dynamics(16)
    st = fast_init_jax(jr.PRNGKey(10), (64, 128), dyn)
    ref_state, ref_rew, ref_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(11), 3))(st)
    pal_state, pal_rew, pal_num = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, jr.PRNGKey(11), 3,
                                        num_bands=2, interpret=True))(st)
    # banded rewards are a band-order fp fold (documented divergence, as in
    # test_banded.py); states and counts stay bitwise
    np.testing.assert_allclose(np.asarray(ref_rew), np.asarray(pal_rew),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(ref_num), np.asarray(pal_num))
    _assert_states_equal(ref_state, pal_state, skip_flow=True)


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
