"""Round-5 last leg, 4-dir: the 16-dir record gained +4 held-out from the
variance-halved estimator (16 envs/eval) — apply the same warm-CMAES leg
to the 4-dir wide artifact (held-out 385.6).  Updates the artifact only
on select AND full-held-out improvement.  Appends to
tools/sweep_mlp16_log.jsonl.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(rec):
    rec = dict(rec, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    print(json.dumps(rec), flush=True)
    with open("tools/sweep_mlp16_log.jsonl", "a") as f:
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

    DYN = eval_protocol_dynamics(4)
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

    log({"item": "final4_boot", "backend": jax.devices()[0].platform})
    record = jnp.asarray(
        np.load("docs/artifacts/lattice4_mlp_wide.npz")["params"])
    rec_sel = heldout(record, 8, SELECT_SEED0)
    rec_held = 672.57
    log({"item": "final4_record_select", "select": rec_sel})

    results = []
    for label, seed, sigma in (("final4_warm_cma_s01_env16", 70, 0.1),
                               ("final4_warm_cma_s005_env16", 71, 0.05)):
        cfg = LatticeTrainConfig(field_size=(64, 128), epochs=300,
                                 epoch_iters=STEPS, popsize=64,
                                 envs_per_eval=16, seed=seed)
        t0 = time.perf_counter()
        trained, _, _ = train_lattice(
            DYN, cfg, params_init=record, common_random_envs=True,
            searcher_fn=lambda d, s=sigma: CMAES(d, popsize=64,
                                                 stdev_init=s))
        wall = time.perf_counter() - t0
        tj = jnp.asarray(trained)
        sel = heldout(tj, 8, SELECT_SEED0)
        log({"item": "final4", "label": label, "select": sel,
             "wall_s": round(wall, 1)})
        results.append((sel, label, np.asarray(trained)))

    sel, label, best = max(results, key=lambda r: r[0])
    if sel > rec_sel:
        held = heldout(jnp.asarray(best), 32, HELDOUT_SEED0)
        log({"item": "final4_heldout", "label": label, "heldout": held})
        if held > rec_held:
            np.savez("docs/artifacts/lattice4_mlp_wide.npz", params=best)
            log({"item": "final4_artifact_updated", "label": label,
                 "heldout": held})
    else:
        log({"item": "final4_flat", "best_select": sel, "label": label})


if __name__ == "__main__":
    main()
