"""Learnable lattice policy: oracle parity, and ES training improves it."""
import pytest
import numpy as np
import jax
import jax.random as jr

from die_tpu.core.rng import np_key
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax, fast_init_np
from die_tpu.fast.learned import (
    LatticeTrainConfig,
    init_turn_params,
    learned_fast_rollout,
    np_init_turn_params,
    oracle_learned_rollout,
    train_lattice,
)

SIZE = (32, 32)


def test_params_init_parity():
    a = np_init_turn_params(np_key(5))
    b = np.asarray(init_turn_params(jr.PRNGKey(5)))
    assert np.array_equal(a, b)


def test_learned_rollout_parity_bitwise():
    dyn = FastDynamics()
    params_np = np_init_turn_params(np_key(2))
    params_j = init_turn_params(jr.PRNGKey(2))
    st_np = fast_init_np(np_key(7), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(7), SIZE, dyn)
    o_state, o_rew, o_num = oracle_learned_rollout(
        dyn, params_np, st_np, np_key(11), 10)
    run = jax.jit(lambda p, s: learned_fast_rollout(dyn, p, s,
                                                    jr.PRNGKey(11), 10))
    j_state, j_rew, j_num = run(params_j, st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    assert np.array_equal(o_state.occ, np.asarray(j_state.occ))
    assert np.array_equal(o_state.chem, np.asarray(j_state.chem))


def test_train_lattice_smoke():
    dyn = FastDynamics(init_agent_ratio=0.2, food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=4, epoch_iters=8,
                             popsize=8, envs_per_eval=1, seed=3)
    logs = []
    best_params, es_state, history = train_lattice(
        dyn, cfg, log_fn=lambda e, m: logs.append(m))
    assert len(history) == 4
    assert best_params.shape == (3, 7)
    assert all(np.isfinite(h["best"]) for h in history)


def test_train_lattice_cmaes_searcher():
    """The searcher_fn hook drives the full-covariance CMAES through the
    lattice trainer (round-5 searcher axis); best params track the CMA
    mean (the state has no .center field)."""
    from die_tpu.learn.es import CMAES

    dyn = FastDynamics(init_agent_ratio=0.2, food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=3, epoch_iters=5,
                             popsize=6, envs_per_eval=1, seed=3)
    best, es_state, history = train_lattice(
        dyn, cfg, searcher_fn=lambda d: CMAES(d, popsize=6,
                                              stdev_init=0.1))
    assert best.shape == (3, 7)
    assert len(history) == 3
    assert hasattr(es_state, "mean") and not hasattr(es_state, "center")
    assert all(np.isfinite(h["best"]) for h in history)


def test_train_conv_nca_cmaes_searcher():
    from die_tpu.fast.nca import train_conv_nca
    from die_tpu.learn.es import CMAES

    dyn = FastDynamics(init_agent_ratio=0.2, food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=2, epoch_iters=4,
                             popsize=4, envs_per_eval=1, seed=2)
    best, es_state, history = train_conv_nca(
        dyn, cfg, hidden=4,
        searcher_fn=lambda d: CMAES(d, popsize=4, stdev_init=0.1))
    assert best.conv.shape == (4, 7, 3, 3)
    assert len(history) == 2
    assert all(np.isfinite(h["best"]) for h in history)


def test_conv_nca_params_parity():
    from die_tpu.fast.nca import (
        init_conv_turn_params,
        np_init_conv_turn_params,
    )

    a = np_init_conv_turn_params(np_key(4))
    b = init_conv_turn_params(jr.PRNGKey(4))
    assert np.array_equal(a.conv, np.asarray(b.conv))
    assert np.array_equal(a.head, np.asarray(b.head))


def test_conv_nca_rollout_parity_bitwise():
    from die_tpu.fast.nca import (
        conv_nca_rollout,
        np_init_conv_turn_params,
        init_conv_turn_params,
        oracle_conv_nca_rollout,
    )

    dyn = FastDynamics()
    p_np = np_init_conv_turn_params(np_key(6))
    p_j = init_conv_turn_params(jr.PRNGKey(6))
    st_np = fast_init_np(np_key(7), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(7), SIZE, dyn)
    o_state, o_rew, _ = oracle_conv_nca_rollout(dyn, p_np, st_np,
                                                np_key(8), 6)
    run = jax.jit(lambda p, s: conv_nca_rollout(dyn, p, s, jr.PRNGKey(8), 6))
    j_state, j_rew, _ = run(p_j, st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    assert np.array_equal(o_state.occ, np.asarray(j_state.occ))


def test_conv_nca_train_smoke():
    from die_tpu.fast.nca import train_conv_nca

    dyn = FastDynamics(init_agent_ratio=0.2, food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=3, epoch_iters=6,
                             popsize=6, envs_per_eval=1, seed=2)
    best, es_state, history = train_conv_nca(dyn, cfg, hidden=4)
    assert len(history) == 3
    assert best.conv.shape == (4, 7, 3, 3)
    assert all(np.isfinite(h["best"]) for h in history)


def test_committed_conv_artifact_beats_jones():
    """The committed conv-NCA checkpoint (docs/artifacts, trained by
    tools/sweep_conv_nca.py crn_pop64: held-out 340.5 vs Jones 283.1 on
    the full 32-seed block) outforages the handcrafted Jones rule on a
    held-out seed block — the capability the reference trains toward
    (/root/reference/examples/learning_agents.py:84-87)."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.nca import ConvTurnParams, conv_nca_rollout
    from die_tpu.fast.rollout import fast_rollout

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "docs", "artifacts", "lattice_conv_beats_jones.npz")
    data = np.load(path)
    params = ConvTurnParams(conv=jnp.asarray(data["conv"]),
                            head=jnp.asarray(data["head"]),
                            bias=jnp.asarray(data["bias"]))
    dyn = eval_protocol_dynamics(8)  # the pinned learning-eval protocol
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    jones = heldout(lambda s, k: fast_rollout(dyn, s, k, steps))
    conv = heldout(lambda s, k: conv_nca_rollout(dyn, params, s, k, steps))
    assert conv > jones


def test_population_sharded_training_identical():
    """ES with the population sharded over an 8-device mesh reproduces the
    unsharded training run exactly (SURVEY §5.8 population sharding)."""
    import jax
    from jax.sharding import Mesh

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.learned import LatticeTrainConfig, train_lattice

    dyn = FastDynamics(food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=3, epoch_iters=4,
                             popsize=8, envs_per_eval=1, seed=3)
    best_ref, es_ref, hist_ref = train_lattice(dyn, cfg)
    mesh = Mesh(np.array(jax.devices()[:8]), ("pop",))
    best_sh, es_sh, hist_sh = train_lattice(dyn, cfg, mesh=mesh)
    assert hist_ref == hist_sh
    assert np.array_equal(best_ref, best_sh)
    assert np.array_equal(np.asarray(es_ref.center), np.asarray(es_sh.center))


def test_train_lattice_checkpoint_resume(tmp_path):
    """Interrupt-at-epoch-k + resume reproduces the uninterrupted run
    exactly (preemption-safe lattice training, as learn/train.py)."""
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.learned import LatticeTrainConfig, train_lattice

    dyn = FastDynamics(food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=4, epoch_iters=3,
                             popsize=4, envs_per_eval=1, seed=5)
    best_ref, es_ref, hist_ref = train_lattice(dyn, cfg)

    ckdir = str(tmp_path / "ck")
    cfg2 = cfg._replace(epochs=2)
    train_lattice(dyn, cfg2, checkpoint_dir=ckdir, checkpoint_every=2)
    import glob

    ck = sorted(glob.glob(ckdir + "/es_*.npz"))[-1]
    best_res, es_res, hist_res = train_lattice(dyn, cfg, resume_from=ck,
                                               start_epoch=2)
    assert hist_res == hist_ref[2:]
    assert np.array_equal(np.asarray(es_ref.center), np.asarray(es_res.center))
    # the global best survives resume even when the best epoch preceded the
    # checkpoint (advisor finding, round 1: best_fit was reset to -inf)
    assert np.array_equal(np.asarray(best_ref), np.asarray(best_res))


def test_jones_mimic_matches_jones_on_strict_orderings():
    """jones_mimic_conv_params (the warm start that unlocks 16-dir
    conv-NCA training — ROADMAP round 3) must reproduce the classic
    Jones argmax (reference semantics /root/reference/core/agent/
    gradient.py:138-152) wherever the ordering is strict, and keep on
    the all-tie state (where Jones' fwd >= comparisons keep too)."""
    from die_tpu.fast.env import FastEnvState
    from die_tpu.fast.nca import jones_mimic_conv_params, make_conv_turn_rule

    rule = make_conv_turn_rule(jones_mimic_conv_params())
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
    # saturated regime: a handful of near-tie cells may fall inside the
    # keep_eps band — require >= 99% agreement and exact tie-keeping
    agree = (turn[strict] == jones[strict]).mean()
    assert agree >= 0.99, agree
    zero = np.zeros((W, H), np.float32)
    assert np.all(np.asarray(rule(np, zero, zero, zero, st, None)) == 0.0)


def test_committed_conv16_artifact_beats_tuned_jones():
    """The committed 16-dir conv-NCA checkpoint (docs/artifacts, trained
    by tools/sweep_conv_nca16_warm.py warm_r05: held-out 692.9 vs tuned
    Jones 653.6 on the full 32-seed block) outforages the tuned Jones
    rule on the finest-turning lattice.  Cold CRN-ES collapsed to the
    keep-only runner (tools/sweep_conv_nca16.py, 172.5); the unlock was
    warm-starting PGPE at jones_mimic_conv_params."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.nca import ConvTurnParams, conv_nca_rollout
    from die_tpu.fast.rollout import fast_rollout

    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts", "lattice16_conv_beats_jones.npz")
    data = np.load(path)
    params = ConvTurnParams(conv=jnp.asarray(data["conv"]),
                            head=jnp.asarray(data["head"]),
                            bias=jnp.asarray(data["bias"]))
    dyn = eval_protocol_dynamics(16)  # the pinned learning-eval protocol
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    jones = heldout(lambda s, k: fast_rollout(dyn, s, k, steps))
    conv = heldout(lambda s, k: conv_nca_rollout(dyn, params, s, k, steps))
    assert conv > jones


def _artifact_heldout_pair(artifact, dyn, n_seeds=6):
    """Held-out (jones, conv) mean episode rewards for a committed
    conv-NCA checkpoint on the pinned learning-eval protocol (64x64, 50
    steps, seed block 10_000 — fast/config.py::EVAL_PROTOCOL)."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL
    from die_tpu.fast.nca import ConvTurnParams, conv_nca_rollout
    from die_tpu.fast.rollout import fast_rollout

    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts", artifact)
    data = np.load(path)
    params = ConvTurnParams(conv=jnp.asarray(data["conv"]),
                            head=jnp.asarray(data["head"]),
                            bias=jnp.asarray(data["bias"]))
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    jones = heldout(lambda s, k: fast_rollout(dyn, s, k, steps))
    conv = heldout(lambda s, k: conv_nca_rollout(dyn, params, s, k, steps))
    return jones, conv


def test_committed_conv4_artifact_beats_jones():
    """4-dir: warm-started CRN-PGPE from the Jones mimic edges out Jones
    (full-block 565.7 vs 560.7 — tools/sweep_conv_nca_warm48.py).  With
    this, LEARNED rules beat the handcrafted rule on all three lattices."""
    from die_tpu.fast.config import eval_protocol_dynamics

    jones, conv = _artifact_heldout_pair("lattice4_conv_beats_jones.npz",
                                         eval_protocol_dynamics(4))
    assert conv > jones


def test_committed_conv8_resumed_artifact_improves():
    """8-dir: resuming CRN-PGPE from the round-2 artifact improves it
    (full-block 351.3 vs the original's 340.5 and Jones' 283.1 —
    tools/sweep_conv_nca_warm48.py resume_r05); the round-2 run had not
    converged."""
    from die_tpu.fast.config import eval_protocol_dynamics

    jones, conv = _artifact_heldout_pair("lattice8_conv_resumed.npz",
                                         eval_protocol_dynamics(8))
    assert conv > jones


def test_committed_wide_mlp16_artifact_beats_conv_record():
    """The WIDE MLP checkpoint (docs/artifacts/lattice16_mlp_wide.npz,
    trained inside the kernel — final held-out **760.14** on the full
    32-seed block after the warm-PGPE 747.1, cold-CMAES 755.96, and
    16-envs/eval warm-CMAES 760.14 legs) vs the conv-NCA record's 692.9
    and tuned Jones' 653.6 — the best forager in the repo, via the
    in-rule far-chem + food probe trios.  Pinned: must beat both the
    conv artifact and Jones on the held-out subsample."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.learned import learned_fast_rollout
    from die_tpu.fast.nca import ConvTurnParams, conv_nca_rollout
    from die_tpu.fast.rollout import fast_rollout

    base = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts")
    wide = jnp.asarray(np.load(os.path.join(
        base, "lattice16_mlp_wide.npz"))["params"])
    assert wide.shape[1] == 14  # the wide-family signature
    cdata = np.load(os.path.join(base, "lattice16_conv_beats_jones.npz"))
    conv = ConvTurnParams(conv=jnp.asarray(cdata["conv"]),
                          head=jnp.asarray(cdata["head"]),
                          bias=jnp.asarray(cdata["bias"]))
    dyn = eval_protocol_dynamics(16)
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    w = heldout(lambda s, k: learned_fast_rollout(dyn, wide, s, k, steps))
    c = heldout(lambda s, k: conv_nca_rollout(dyn, conv, s, k, steps))
    j = heldout(lambda s, k: fast_rollout(dyn, s, k, steps))
    assert w > c > j, (w, c, j)


def test_committed_ctx16_artifact_beats_conv_record():
    """The CTX checkpoint (docs/artifacts/lattice16_mlp_ctx.npz — warm
    CMAES s0.1 from the embedded wide record: held-out 756.4 vs the wide
    755.96 and conv 692.9).  The depthwise context bought +0.5 at these
    budgets — marginal, reported as such (docs/ROADMAP.md round 5c);
    pinned only against the conv record and Jones."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.learned import learned_fast_rollout
    from die_tpu.fast.nca import ConvTurnParams, conv_nca_rollout

    base = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts")
    ctx = jnp.asarray(np.load(os.path.join(
        base, "lattice16_mlp_ctx.npz"))["params"])
    assert ctx.shape[1] == 21  # the ctx-family signature
    cdata = np.load(os.path.join(base, "lattice16_conv_beats_jones.npz"))
    conv = ConvTurnParams(conv=jnp.asarray(cdata["conv"]),
                          head=jnp.asarray(cdata["head"]),
                          bias=jnp.asarray(cdata["bias"]))
    dyn = eval_protocol_dynamics(16)
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    c = heldout(lambda s, k: learned_fast_rollout(dyn, ctx, s, k, steps))
    v = heldout(lambda s, k: conv_nca_rollout(dyn, conv, s, k, steps))
    assert c > v


@pytest.mark.parametrize("dirs", [4, 8])
def test_committed_wide_mlp48_artifacts_beat_linear_records(dirs):
    """The 4/8-dir wide-MLP checkpoints (docs/artifacts/
    lattice{4,8}_mlp_wide.npz — full-block held-out 672.6 / 385.6 vs the
    previous linear records 574.6 / 361.1 and Jones 560.7 / 283.1): the
    wide family now holds the learned-rule record on ALL THREE lattices.
    Pinned: wide > the committed linear artifact > nothing assumed of
    Jones here (covered by the linear tests)."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.learned import learned_fast_rollout

    base = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts")
    wide = jnp.asarray(np.load(os.path.join(
        base, f"lattice{dirs}_mlp_wide.npz"))["params"])
    assert wide.shape[1] == 14
    lin = jnp.asarray(np.load(os.path.join(
        base, f"lattice{dirs}_linear.npz"))["params"])
    dyn = eval_protocol_dynamics(dirs)
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(params, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = learned_fast_rollout(
                dyn, params, st, jr.fold_in(jr.PRNGKey(seed0 + 1), i), steps)
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    assert heldout(wide) > heldout(lin)


def test_committed_linear16_r5_artifact_beats_original():
    """The round-5 CMAES-refined linear checkpoint (docs/artifacts/
    lattice16_linear_r5.npz — full-covariance CMAES sigma 0.1 resumed
    from the 662.3 center, held-out 689.0): the round-4 'linear family
    plateaus' conclusion was a searcher artifact.  Pinned: the refined
    params must beat BOTH tuned Jones and the original linear artifact
    on the held-out subsample."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.learned import learned_fast_rollout

    base = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts")
    p_r5 = jnp.asarray(np.load(os.path.join(
        base, "lattice16_linear_r5.npz"))["params"])
    p_r4 = jnp.asarray(np.load(os.path.join(
        base, "lattice16_linear.npz"))["params"])
    dyn = eval_protocol_dynamics(16)
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(params, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = learned_fast_rollout(
                dyn, params, st, jr.fold_in(jr.PRNGKey(seed0 + 1), i), steps)
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    assert heldout(p_r5) > heldout(p_r4)


def test_committed_mlp16_artifact_beats_tuned_jones():
    """The committed 16-dir per-cell MLP checkpoint (docs/artifacts/
    lattice16_mlp.npz, trained INSIDE the kernel at ~470K env-steps/s by
    tools/sweep_mlp16.py: held-out 689.9 vs tuned Jones 653.6 on the full
    32-seed block) outforages the tuned Jones rule — the round-5
    nonlinear family above the linear rule's 662.3.  (The sweep's 'cold'
    rows at 288.9/570.1 measured the LINEAR family — a params_init=None
    fallback, fixed in the sweep — replicating round 4's cold-linear
    collapse and adding the cold-CMAES-doesn't-fully-collapse searcher
    finding for it.)"""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.learned import learned_fast_rollout
    from die_tpu.fast.rollout import fast_rollout

    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts", "lattice16_mlp.npz")
    params = jnp.asarray(np.load(path)["params"])
    assert params.shape[0] > 3  # the MLP family (shape-dispatched)
    dyn = eval_protocol_dynamics(16)
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    jones = heldout(lambda s, k: fast_rollout(dyn, s, k, steps))
    mlp = heldout(lambda s, k: learned_fast_rollout(dyn, params, s, k,
                                                    steps))
    assert mlp > jones


@pytest.mark.parametrize("dirs", [4, 8, 16])
def test_committed_linear_artifact_beats_tuned_jones(dirs):
    """The committed LINEAR checkpoints (docs/artifacts/
    lattice{4,16}_linear.npz, trained by tools/sweep_linear16.py at kernel
    speed) outforage the tuned Jones rule — 16-dir: held-out 662.3 vs
    653.6 (first linear rule to do so on the finest-turning lattice; cold
    CRN-ES collapses there at 288.9, same failure as the conv's — the
    unlock was warm-starting PGPE at jones_identity_params, the EXACT
    identity-weight Jones mimic); 4-dir: 574.6 vs 560.7, also above the
    round-3 conv's 565.7.  Linear rules now beat Jones on all three
    lattices (8-dir: 347.8 vs 283.1, round 2)."""
    import os

    import jax.numpy as jnp

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.learned import learned_fast_rollout
    from die_tpu.fast.rollout import fast_rollout

    path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                        "artifacts", f"lattice{dirs}_linear.npz")
    params = jnp.asarray(np.load(path)["params"])
    dyn = eval_protocol_dynamics(dirs)  # the pinned learning-eval protocol
    size = (EVAL_PROTOCOL["size"],) * 2
    steps, seed0 = EVAL_PROTOCOL["steps"], EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn, n_seeds=6):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i), size, dyn)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        return float(np.mean(np.asarray(
            jax.jit(jax.vmap(one))(jnp.arange(n_seeds)))))

    jones = heldout(lambda s, k: fast_rollout(dyn, s, k, steps))
    linear = heldout(lambda s, k: learned_fast_rollout(dyn, params, s, k,
                                                       steps))
    assert linear > jones
