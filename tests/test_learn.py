"""ES searcher mechanics and a smoke training run on a quadratic + tiny NCA."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core.config import Dynamics
from die_tpu.learn.es import OpenAIES, PGPE, centered_ranks
from die_tpu.learn.train import TrainConfig, train
from die_tpu.models.nca import NCAPolicy


def test_centered_ranks():
    f = jnp.asarray([10.0, -5.0, 3.0, 100.0])
    r = np.asarray(centered_ranks(f))
    assert r.min() == -0.5 and r.max() == 0.5
    assert r[3] == 0.5 and r[1] == -0.5


def _optimize_quadratic(searcher_cls, **kw):
    """Both searchers must maximize -||x - target||^2 on a 20-dim problem."""
    d = 20
    target = jnp.linspace(-1.0, 1.0, d)
    searcher = searcher_cls(d, **kw)
    state = searcher.init(jnp.zeros(d))

    @jax.jit
    def gen(state, key):
        pop, eps = searcher.ask(state, key)
        fit = -jnp.sum((pop - target[None, :]) ** 2, axis=1)
        return searcher.tell(state, eps, fit), jnp.max(fit)

    best = -np.inf
    for i in range(300):
        state, b = gen(state, jr.PRNGKey(i))
        best = max(best, float(b))
    final = -float(jnp.sum((state.center - target) ** 2))
    return final


def test_pgpe_optimizes():
    final = _optimize_quadratic(PGPE, popsize=16, radius_init=1.5,
                                max_speed=0.1)
    assert final > -0.5, final  # started at -13.8


def test_openai_es_optimizes():
    final = _optimize_quadratic(OpenAIES, popsize=32, learning_rate=0.05,
                                stdev=0.1)
    assert final > -0.5, final


def test_train_smoke_nca():
    """Tiny end-to-end neuroevolution: NCA agent on a small env, few epochs."""
    dyn = Dynamics(init_agent_ratio=0.2, food_infinite=True)
    policy = NCAPolicy(scale=0.01, deposit=2.0, kernel_sizes=(3,))
    cfg = TrainConfig(field_size=(12, 12), max_agents=64, epochs=3,
                      epoch_iters=5, popsize=4, seed=1)
    logs = []
    best_params, es_state, history = train(
        dyn, policy, cfg, log_fn=lambda e, m: logs.append(m))
    assert len(history) == 3
    assert len(logs) == 3
    assert all(np.isfinite(m["best"]) for m in history)
    # best params are a valid kernel pytree
    assert isinstance(best_params, tuple) and best_params[0].shape == (3, 3, 3, 3)


def test_checkpoint_roundtrip(tmp_path):
    from die_tpu.learn.es import EsState
    from die_tpu.utils.checkpoint import load_pytree, save_pytree

    st = EsState(center=jnp.arange(5, dtype=jnp.float32),
                 stdev=jnp.ones(5), velocity=jnp.zeros(5),
                 step=jnp.int32(7))
    p = tmp_path / "es.npz"
    save_pytree(p, st)
    st2 = load_pytree(p, st)
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_train_resume_matches_uninterrupted(tmp_path):
    """Checkpoint at epoch 2, resume, finish — identical final ES state."""
    from die_tpu.core.config import Dynamics

    dyn = Dynamics(init_agent_ratio=0.2, food_infinite=True)
    policy = NCAPolicy(scale=0.01, deposit=2.0, kernel_sizes=(3,))
    cfg = TrainConfig(field_size=(12, 12), max_agents=64, epochs=4,
                      epoch_iters=4, popsize=4, seed=9)

    _, full_state, _ = train(dyn, policy, cfg)

    # run 2 epochs with checkpointing, then resume for the rest
    _, _, _ = train(dyn, policy,
                    TrainConfig(**{**cfg.__dict__, "epochs": 2}),
                    checkpoint_dir=str(tmp_path), checkpoint_every=2)
    ckpt = tmp_path / "es_000001.npz"
    assert ckpt.exists()
    _, resumed_state, hist = train(dyn, policy, cfg,
                                   resume_from=str(ckpt), start_epoch=2)
    assert len(hist) == 2
    for a, b in zip(jax.tree.leaves(full_state), jax.tree.leaves(resumed_state)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sep_cmaes_optimizes():
    from die_tpu.learn.es import SepCMAES

    d = 20
    target = jnp.linspace(-1.0, 1.0, d)
    searcher = SepCMAES(d, popsize=16, stdev_init=0.3)
    state = searcher.init(jnp.zeros(d))

    @jax.jit
    def gen(state, key):
        pop, z = searcher.ask(state, key)
        fit = -jnp.sum((pop - target[None, :]) ** 2, axis=1)
        return searcher.tell(state, z, fit), jnp.max(fit)

    for i in range(250):
        state, b = gen(state, jr.PRNGKey(i))
    final = -float(jnp.sum((state.mean - target) ** 2))
    assert final > -0.05, final


def test_train_with_cmaes_smoke():
    from die_tpu.core.config import Dynamics

    dyn = Dynamics(init_agent_ratio=0.2, food_infinite=True)
    policy = NCAPolicy(scale=0.01, deposit=2.0, kernel_sizes=(3,))
    cfg = TrainConfig(field_size=(12, 12), max_agents=64, epochs=2,
                      epoch_iters=4, popsize=6, seed=4, searcher="cmaes")
    best_params, es_state, history = train(dyn, policy, cfg)
    assert len(history) == 2
    assert all(np.isfinite(h["best"]) for h in history)
