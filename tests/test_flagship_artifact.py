"""The reference-flagship training run's committed artifact (VERDICT r3
item 3): exact-engine NCA at 96², PGPE popsize 10, 1000 epochs x 30 iters
on st-perlin-wide — the reference's canonical demo config
(/root/reference/examples/learning_agents.py:146-152).

Trained by examples/learning_agents.py (seed 0, CPU backend, ~11 min);
curve + artifact committed under docs/artifacts/ (full-protocol held-out
eval: trained 728.2 vs untrained -1695.7 over 16 seeds, 81% episode wins —
tools/eval_nca_flagship.py)."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

ART = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                   "artifacts", "nca_flagship_pgpe1000.npz")
CURVE = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                     "artifacts", "nca_flagship_pgpe1000_curve.jsonl")


def test_curve_shows_learning():
    rows = [json.loads(l) for l in open(CURVE)]
    assert len(rows) == 1000
    first = np.mean([r["mean"] for r in rows[:100]])
    last = np.mean([r["mean"] for r in rows[-100:]])
    assert last > first + 500  # committed run: -793 -> +307


def test_artifact_beats_untrained_on_heldout_seeds():
    from die_tpu.core import channels as ch
    from die_tpu.core.config import preset
    from die_tpu.core.init import init_env_state
    from die_tpu.models.nca import NCAPolicy
    from die_tpu.parallel.rollout import rollout

    policy, trained = NCAPolicy.load(ART)
    untrained = policy.init_model_params(jr.PRNGKey(777_001))
    dyn = preset("st-perlin-wide", 0.10)
    size, iters, seeds = (96, 96), 30, 4
    heldout = 777_000  # disjoint from the training seed stream (seed 0)

    def one(params, i):
        mk = jr.fold_in(jr.PRNGKey(heldout), i)
        state = init_env_state(jr.fold_in(mk, ch.TAG_SESSION_ENV_INIT),
                               size, dyn, size[0] * size[1])
        pstate = policy.init_state(jr.fold_in(mk,
                                              ch.TAG_SESSION_POLICY_INIT))
        res = rollout(dyn, policy, params, state, pstate,
                      jr.fold_in(mk, ch.TAG_SESSION_ROLLOUT), iters)
        return res.total_reward

    run = jax.jit(jax.vmap(one, in_axes=(None, 0)))
    tr = np.asarray(run(trained, jnp.arange(seeds)))
    un = np.asarray(run(untrained, jnp.arange(seeds)))
    assert tr.mean() > un.mean(), (tr, un)
