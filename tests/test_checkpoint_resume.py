"""Exact mid-rollout resume: save state at step k, restore, continue — must
be bitwise identical to the uninterrupted trajectory (the capability the
reference lacks entirely, SURVEY §5.4)."""
import numpy as np
import jax
import jax.random as jr

from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.models.gradient import PhysarumPolicy
from die_tpu.parallel.rollout import rollout
from die_tpu.utils.checkpoint import load_pytree, save_pytree

SIZE = (16, 16)
N = 256


def test_mid_rollout_resume_bitwise(tmp_path):
    dyn = Dynamics()
    policy = PhysarumPolicy(max_agents=N, scale=0.01, sense_offset=0.04)
    state = init_env_state(jr.PRNGKey(1), SIZE, dyn, N)
    pstate = policy.init_state(jr.PRNGKey(2))
    key = jr.PRNGKey(3)

    run = jax.jit(lambda s, p, t, n: rollout(dyn, policy, None, s, p, key,
                                             n, t),
                  static_argnums=(2, 3))

    # uninterrupted 12 steps
    full = run(state, pstate, 0, 12)

    # first 5 steps -> checkpoint -> restore -> 7 more (t0=5)
    part1 = run(state, pstate, 0, 5)
    ckpt = tmp_path / "mid.npz"
    save_pytree(ckpt, (part1.state, part1.pstate))
    restored_state, restored_pstate = load_pytree(
        ckpt, (part1.state, part1.pstate))
    part2 = run(jax.tree.map(jax.numpy.asarray, restored_state),
                jax.tree.map(jax.numpy.asarray, restored_pstate), 5, 7)

    assert np.array_equal(np.asarray(full.state.agents),
                          np.asarray(part2.state.agents))
    assert np.array_equal(np.asarray(full.state.medium),
                          np.asarray(part2.state.medium))
    assert np.array_equal(np.asarray(full.rewards[5:]),
                          np.asarray(part2.rewards))


def test_config_json_roundtrip():
    from die_tpu.core.config import Boundary, Dynamics, FlowConfig
    from die_tpu.fast.config import FastDynamics

    d = Dynamics(boundary=Boundary.LIMIT, agents_die=True,
                 flow=FlowConfig(kind="wave", scale=0.25))
    d2 = Dynamics.from_json(d.to_json())
    assert d2 == d

    f = FastDynamics(sense_dist=5, agents_die=True)
    f2 = FastDynamics.from_json(f.to_json())
    assert f2 == f


def test_orbax_sharded_roundtrip(tmp_path):
    """Sharded save/restore of a batched fast-engine state on the CPU mesh."""
    import jax.numpy as jnp

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.parallel.mesh import env_mesh, shard_env_batch
    from die_tpu.utils.checkpoint import load_sharded, save_sharded

    dyn = FastDynamics()
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[fast_init_jax(jr.PRNGKey(b), (16, 16), dyn) for b in range(8)])
    mesh = env_mesh()
    sharded = shard_env_batch(mesh, states)
    path = tmp_path / "ckpt"
    save_sharded(path, sharded)
    # restore with the sharded template: layout and values round-trip
    restored = load_sharded(path, sharded)
    for a, b in zip(jax.tree.leaves(sharded), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
