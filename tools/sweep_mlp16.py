"""Round-5 sweep: train the per-cell MLP turn rule (the kernel-resident
NONLINEAR family, die_tpu/fast/learned.py round 5) on the tuned
16-direction lattice, and attack the warm-start plateau with the searcher
axis (VERDICT r4 #1/#2): full-covariance CMAES, bigger PGPE populations,
and restart seeds — all at kernel training speed (~20 s per 200-epoch
popsize-64 config, docs/PERF.md round 4).

Protocol: the pinned learning-eval protocol (fast/config.py EVAL_PROTOCOL)
— selection on 8 envs at seed block 20_000 (disjoint), final held-out on
32 envs at 10_000 for the selected config only.  Baselines (BASELINE.md):
tuned Jones 653.6, warm conv-NCA 692.9 (the record), warm linear 662.3.

Appends JSONL to tools/sweep_mlp16_log.jsonl.
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", type=int, default=16, choices=(4, 8, 16))
    ap.add_argument("--only", default=None,
                    help="comma-separated config labels to run")
    ap.add_argument("--no-artifact", action="store_true")
    ap.add_argument("--family", default="mlp", choices=("mlp", "wide"),
                    help="'wide' trains the 13-feature wide MLP "
                         "(in-rule far-chem + food probe trios)")
    args = ap.parse_args()

    from die_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.learned import (
        LatticeTrainConfig,
        jones_mimic_mlp_params,
        learned_fast_rollout,
        train_lattice,
    )
    from die_tpu.fast.rollout import fast_rollout
    from die_tpu.learn.es import CMAES

    DYN = eval_protocol_dynamics(args.dirs)
    SIZE, STEPS = EVAL_PROTOCOL["size"], EVAL_PROTOCOL["steps"]
    SELECT_SEED0, HELDOUT_SEED0 = 20_000, EVAL_PROTOCOL["seed0"]

    def heldout(roll_fn, num_seeds, seed0):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i),
                               (SIZE, SIZE), DYN)
            _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
            return jnp.sum(rewards)

        totals = jax.jit(jax.vmap(one))(jnp.arange(num_seeds))
        return float(np.asarray(jnp.mean(totals)))

    jones = heldout(lambda s, k: fast_rollout(DYN, s, k, STEPS), 8,
                    SELECT_SEED0)
    log({"item": "jones_select", "dirs": args.dirs, "score": jones,
         "family": args.family})

    if args.family == "wide":
        from die_tpu.fast.learned import jones_mimic_mlp_wide_params

        mimic = jnp.asarray(jones_mimic_mlp_wide_params())
    else:
        mimic = jnp.asarray(jones_mimic_mlp_params())
    mim_sel = heldout(lambda s, k: learned_fast_rollout(
        DYN, mimic, s, k, STEPS), 8, SELECT_SEED0)
    log({"item": f"{args.family}_mimic_select", "score": mim_sel})

    results = [(mim_sel, f"{args.family}_mimic", np.asarray(mimic))]

    def cma(sigma):
        return lambda d: CMAES(d, popsize=64, stdev_init=sigma)

    # label, epochs, pop, seed, warm, radius, searcher_fn
    CONFIGS = [
        ("cold_e200_p64", 200, 64, 0, False, 0.5, None),
        ("warm_r015_crn", 200, 64, 0, True, 0.15, None),
        ("warm_r05_crn", 200, 64, 0, True, 0.5, None),
        ("warm_r05_crn_e400", 400, 64, 1, True, 0.5, None),
        ("warm_p256_e200", 200, 256, 2, True, 0.5, None),
        ("warm_cma_s005", 300, 64, 0, True, None, cma(0.05)),
        ("warm_cma_s015", 300, 64, 1, True, None, cma(0.15)),
        ("cold_cma_s03", 300, 64, 0, False, None, cma(0.3)),
    ]
    # cold runs must init the FAMILY being swept (params_init=None would
    # fall back to train_lattice's linear default — the first run of this
    # sweep hit that: its 'cold' rows measured the LINEAR family)
    if args.family == "wide":
        from die_tpu.fast.learned import init_mlp_wide_params

        cold0 = init_mlp_wide_params(jr.PRNGKey(0))
    else:
        from die_tpu.fast.learned import init_mlp_params

        cold0 = init_mlp_params(jr.PRNGKey(0))
    for label, epochs, pop, seed, warm, radius, sf in CONFIGS:
        if args.only and label not in args.only.split(","):
            continue
        cfg = LatticeTrainConfig(field_size=(64, 128), epochs=epochs,
                                 epoch_iters=STEPS, popsize=pop,
                                 envs_per_eval=8, seed=seed)
        t0 = time.perf_counter()
        best, _, hist = train_lattice(
            DYN, cfg, params_init=mimic if warm else cold0,
            common_random_envs=True,
            radius_init=radius if radius is not None else 0.5,
            searcher_fn=sf)
        wall = time.perf_counter() - t0
        bestj = jnp.asarray(best)
        sel = heldout(lambda s, k: learned_fast_rollout(
            DYN, bestj, s, k, STEPS), 8, SELECT_SEED0)
        log({"item": "trained", "label": label, "select_score": sel,
             "train_final_best": hist[-1]["best"],
             "wall_s": round(wall, 1)})
        results.append((sel, label, np.asarray(best)))

    sel, label, best = max(results, key=lambda r: r[0])
    bestj = jnp.asarray(best)
    held = heldout(lambda s, k: learned_fast_rollout(
        DYN, bestj, s, k, STEPS), 32, HELDOUT_SEED0)
    log({"item": "selected_heldout", "dirs": args.dirs, "label": label,
         "family": args.family, "heldout": held})
    if not args.no_artifact:
        suffix = "mlp" if args.family == "mlp" else "mlp_wide"
        art = f"docs/artifacts/lattice{args.dirs}_{suffix}.npz"
        np.savez(art, params=best)
        log({"item": "artifact", "path": art, "label": label,
             "heldout": held})


if __name__ == "__main__":
    main()
