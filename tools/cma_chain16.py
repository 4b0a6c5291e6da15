"""Round-5 CMAES chaining: the searcher-axis sweep showed full-covariance
CMAES (sigma 0.1) lifts the linear 16-dir rule 662.3 -> 689.0 held-out
where PGPE resumes measured flat — so chain it: resume each family's BEST
center under CMAES s0.1 (and s0.05) for another leg, re-evaluating
held-out and updating the artifact only on improvement.

Families: linear (lattice16_linear_r5.npz if present, else
lattice16_linear.npz), mlp (lattice16_mlp.npz), wide
(lattice16_mlp_wide.npz if present).  Appends to
tools/sweep_searchers16_log.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(rec):
    rec = dict(rec, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    print(json.dumps(rec), flush=True)
    with open("tools/sweep_searchers16_log.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    from die_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.learned import (
        LatticeTrainConfig,
        learned_fast_rollout,
        train_lattice,
    )
    from die_tpu.learn.es import CMAES

    DYN = eval_protocol_dynamics(16)
    SIZE, STEPS = EVAL_PROTOCOL["size"], EVAL_PROTOCOL["steps"]
    SELECT_SEED0, HELDOUT_SEED0 = 20_000, EVAL_PROTOCOL["seed0"]

    def heldout(params, num_seeds, seed0):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i),
                               (SIZE, SIZE), DYN)
            _, rewards, _ = learned_fast_rollout(
                DYN, params, st, jr.fold_in(jr.PRNGKey(seed0 + 1), i), STEPS)
            return jnp.sum(rewards)

        totals = jax.jit(jax.vmap(one))(jnp.arange(num_seeds))
        return float(np.asarray(jnp.mean(totals)))

    FAMS = []
    if os.path.exists("docs/artifacts/lattice16_linear_r5.npz"):
        FAMS.append(("linear", "docs/artifacts/lattice16_linear_r5.npz"))
    else:
        FAMS.append(("linear", "docs/artifacts/lattice16_linear.npz"))
    FAMS.append(("mlp", "docs/artifacts/lattice16_mlp.npz"))
    if os.path.exists("docs/artifacts/lattice16_mlp_wide.npz"):
        FAMS.append(("wide", "docs/artifacts/lattice16_mlp_wide.npz"))

    for fam, path in FAMS:
        p0 = jnp.asarray(np.load(path)["params"])
        sel0 = heldout(p0, 8, SELECT_SEED0)
        log({"item": "chain_start", "family": fam, "select": sel0})
        best_sel, best_p = sel0, np.asarray(p0)
        center = p0
        for leg, sigma, seed in ((1, 0.1, 21), (2, 0.05, 22), (3, 0.1, 23)):
            cfg = LatticeTrainConfig(field_size=(64, 128), epochs=300,
                                     epoch_iters=STEPS, popsize=64,
                                     envs_per_eval=8, seed=seed)
            t0 = time.perf_counter()
            trained, _, _ = train_lattice(
                DYN, cfg, params_init=center, common_random_envs=True,
                searcher_fn=lambda d, s=sigma: CMAES(d, popsize=64,
                                                     stdev_init=s))
            wall = time.perf_counter() - t0
            tj = jnp.asarray(trained)
            sel = heldout(tj, 8, SELECT_SEED0)
            log({"item": "chain_leg", "family": fam, "leg": leg,
                 "sigma": sigma, "select": sel, "wall_s": round(wall, 1)})
            if sel > best_sel:
                best_sel, best_p = sel, np.asarray(trained)
            center = tj  # chain continues from the latest leg regardless
        if best_sel > sel0:
            held = heldout(jnp.asarray(best_p), 32, HELDOUT_SEED0)
            log({"item": "chain_heldout", "family": fam, "select": best_sel,
                 "heldout": held})
            out = {"linear": "docs/artifacts/lattice16_linear_r5.npz",
                   "mlp": "docs/artifacts/lattice16_mlp.npz",
                   "wide": "docs/artifacts/lattice16_mlp_wide.npz"}[fam]
            prev_held = {"linear": 689.0, "mlp": 689.9,
                         "wide": 755.96}[fam]
            if held > prev_held:
                np.savez(out, params=best_p)
                log({"item": "chain_artifact_updated", "family": fam,
                     "path": out, "heldout": held})
        else:
            log({"item": "chain_flat", "family": fam, "select": best_sel})


if __name__ == "__main__":
    main()
