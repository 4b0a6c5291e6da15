"""Round-5 last leg: wide-family configs with DOUBLE the fitness-eval
budget (16 envs/member vs the sweeps' 8 — halves estimator variance) —
warm CMAES from the record center and cold CMAES.  Artifact updates only
on a select AND full-held-out improvement.  Appends to
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
        init_mlp_wide_params,
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

    log({"item": "final_boot", "backend": jax.devices()[0].platform})
    record = jnp.asarray(
        np.load("docs/artifacts/lattice16_mlp_wide.npz")["params"])
    # leg 2 (after the 760.14 update): chain from the CURRENT artifact
    RECORD_SELECT, RECORD_HELD = 763.14, 760.14

    results = []
    CONFIGS = [
        ("final2_warm_cma_s01_env16", 300, 64, 52, "warm", 0.1),
        ("final2_warm_cma_s005_env16", 300, 64, 53, "warm", 0.05),
        ("final2_warm_cma_s01_env32", 300, 64, 54, "warm32", 0.1),
    ]
    for label, epochs, pop, seed, start, sigma in CONFIGS:
        cfg = LatticeTrainConfig(field_size=(64, 128), epochs=epochs,
                                 epoch_iters=STEPS, popsize=pop,
                                 envs_per_eval=32 if start == "warm32"
                                 else 16, seed=seed)
        p0 = record if start in ("warm", "warm32") \
            else init_mlp_wide_params(jr.PRNGKey(0))
        t0 = time.perf_counter()
        trained, _, _ = train_lattice(
            DYN, cfg, params_init=p0, common_random_envs=True,
            searcher_fn=lambda d, s=sigma: CMAES(d, popsize=pop,
                                                 stdev_init=s))
        wall = time.perf_counter() - t0
        tj = jnp.asarray(trained)
        sel = heldout(tj, 8, SELECT_SEED0)
        log({"item": "final", "label": label, "select": sel,
             "wall_s": round(wall, 1)})
        results.append((sel, label, np.asarray(trained)))

    sel, label, best = max(results, key=lambda r: r[0])
    if sel > RECORD_SELECT:
        held = heldout(jnp.asarray(best), 32, HELDOUT_SEED0)
        log({"item": "final_heldout", "label": label, "heldout": held})
        if held > RECORD_HELD:
            np.savez("docs/artifacts/lattice16_mlp_wide.npz", params=best)
            log({"item": "final_artifact_updated", "label": label,
                 "heldout": held})
    else:
        log({"item": "final_flat", "best_select": sel, "label": label})


if __name__ == "__main__":
    main()
