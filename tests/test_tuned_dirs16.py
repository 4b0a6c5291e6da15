"""The tuned 16-direction lattice must outforage the 8-direction default
(round-3 VERDICT item 5: at the 8-dir defaults the finest-turning lattice —
the closest analog of the reference Physarum's 30-degree turns — was the
WORST forager by 10-20x; the tuned operating point in
fast/config.py::tuned_dynamics reverses that).  Deterministic: fixed
held-out seed block of the eval_lattice protocol."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from die_tpu.fast.config import FastDynamics, tuned_dynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.rollout import fast_rollout


def heldout(dyn, size=64, steps=50, num_seeds=6, seed0=10_000):
    def one(i):
        st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i),
                           (size, size), dyn)
        _, rewards, _ = fast_rollout(dyn, st, jr.fold_in(
            jr.PRNGKey(seed0 + 1), i), steps)
        return jnp.sum(rewards)

    return float(np.asarray(jnp.mean(
        jax.jit(jax.vmap(one))(jnp.arange(num_seeds)))))


@pytest.mark.slow
def test_tuned_16dir_beats_8dir_default():
    dyn8 = FastDynamics(init_agent_ratio=0.15, food_infinite=True)
    dyn16 = tuned_dynamics(16, init_agent_ratio=0.15, food_infinite=True)
    v8 = heldout(dyn8)
    v16 = heldout(dyn16)
    assert v16 > v8, (v16, v8)


@pytest.mark.slow
def test_tuned_16dir_far_above_its_defaults():
    """The 8-dir-tuned defaults applied to 16 directions forage an order of
    magnitude worse than the tuned point (the round-2 weakness this fixes)."""
    default16 = FastDynamics(num_dirs=16, init_agent_ratio=0.15,
                             food_infinite=True)
    tuned16 = tuned_dynamics(16, init_agent_ratio=0.15, food_infinite=True)
    assert heldout(tuned16) > 5.0 * heldout(default16)


def test_tuned_dynamics_other_lattices_passthrough():
    assert tuned_dynamics(8) == FastDynamics()
    assert tuned_dynamics(4) == FastDynamics(num_dirs=4)
    assert tuned_dynamics(16, sense_dist=3).sense_dist == 3


def test_eval_protocol_pinned():
    """The learning-eval protocol config that EVERY committed artifact
    score (692.9 / 662.3 / 653.6 / ...) is measured under, pinned field by
    field: editing tuned_dynamics, EVAL_PROTOCOL, or eval_protocol_dynamics
    breaks this test instead of silently moving the baseline the artifact
    regressions compare against (VERDICT r4 weak #3)."""
    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics

    assert EVAL_PROTOCOL == dict(size=64, steps=50, seed0=10_000,
                                 full_seeds=32, init_agent_ratio=0.15,
                                 food_infinite=True)
    d16 = eval_protocol_dynamics(16)
    assert d16 == FastDynamics(
        num_dirs=16, sense_dist=2, deposit_coef=0.5, rate_decay_chem=0.05,
        diffuse_sigma=1.25, idle_deposit=0.025, randomize_on_block=False,
        init_agent_ratio=0.15, food_infinite=True)
    assert eval_protocol_dynamics(8) == FastDynamics(
        init_agent_ratio=0.15, food_infinite=True)
    assert eval_protocol_dynamics(4) == FastDynamics(
        num_dirs=4, init_agent_ratio=0.15, food_infinite=True)
    # the non-obvious protocol-relevant defaults ride inside FastDynamics:
    # pin the ones the sweeps depended on explicitly
    assert (d16.rate_feed, d16.cost_move, d16.cost_deposit) == \
        (0.1, 0.01, 0.02)
    assert (d16.agents_die, d16.agents_born) == (False, False)
    assert d16.rng_kind == "murmur"
