"""Round-4 sweep: train the LINEAR turn rule on the tuned 16-direction
lattice — the first linear-rule attempt there (round 3 only trained the
conv-NCA, which needed a Jones-mimic warm start: cold CRN-ES collapses to
the keep-only straight-runner on keep-heading-on-block dynamics).

Enabled by the round-4 learned kernel (die_tpu/fast/pallas_step.py
``learned=True``): training at field (64, 128) runs the K-step kernel
(~480K training env-steps/s — docs/PERF.md round 4), so epoch budgets
that took minutes on the XLA scan take seconds.

Protocol follows tools/sweep_dirs16.py: selection on 8 envs at seed block
20_000 (disjoint from the held-out block), final held-out on 32 envs at
10_000 for the single selected config only.  Baselines (same protocol,
BASELINE.md): tuned Jones 653.6, warm-started conv-NCA 692.9.

Appends JSONL to tools/sweep_linear16_log.jsonl.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(rec):
    rec = dict(rec, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    print(json.dumps(rec), flush=True)
    with open("tools/sweep_linear16_log.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", type=int, default=16, choices=(4, 8, 16))
    ap.add_argument("--warm-only", action="store_true")
    args = ap.parse_args()

    from die_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import tuned_dynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.learned import (
        LatticeTrainConfig,
        learned_fast_rollout,
        train_lattice,
    )
    from die_tpu.fast.rollout import fast_rollout

    # the round-3 lattice-learning protocol's dynamics (tools/
    # sweep_conv_nca16_warm.py) — NOT bare tuned_dynamics(16): the first
    # run of this sweep used the bare config and measured Jones at 151.6,
    # not the 653.6 baseline (density + finite food change the game)
    DYN = tuned_dynamics(args.dirs, init_agent_ratio=0.15,
                         food_infinite=True)
    SIZE, STEPS = 64, 50
    SELECT_SEED0, HELDOUT_SEED0 = 20_000, 10_000

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
    log({"item": "jones_select", "score": jones})

    # Phase 1 (cold) result, measured first: ALL cold configs collapse to
    # the keep-only straight-runner (select 27.8, held-out 24.7 vs Jones
    # 653.6) — the same failure mode round 3 measured for the cold
    # conv-NCA.  Phase 2 applies the same fix: a Jones-mimic warm start,
    # which the linear rule expresses EXACTLY (identity weights).
    from die_tpu.fast.learned import jones_identity_params

    mimic = jnp.asarray(jones_identity_params())
    mim_sel = heldout(lambda s, k: learned_fast_rollout(
        DYN, mimic, s, k, STEPS), 8, SELECT_SEED0)
    log({"item": "identity_mimic_select", "score": mim_sel})

    results = [(mim_sel, "identity_mimic", mimic)]
    for label, epochs, pop, seed, warm, radius, crn in (
        ("cold_e200_p64_s0", 200, 64, 0, False, 0.5, True),
        ("warm_r015_crn", 200, 64, 0, True, 0.15, True),
        ("warm_r05_crn", 200, 64, 0, True, 0.5, True),
        ("warm_r05_crn_e400", 400, 64, 1, True, 0.5, True),
    ):
        if args.warm_only and not warm:
            continue
        cfg = LatticeTrainConfig(field_size=(64, 128), epochs=epochs,
                                 epoch_iters=STEPS, popsize=pop,
                                 envs_per_eval=8, seed=seed)
        t0 = time.perf_counter()
        best, _, hist = train_lattice(
            DYN, cfg, params_init=mimic if warm else None,
            common_random_envs=crn, radius_init=radius)
        wall = time.perf_counter() - t0
        sel = heldout(lambda s, k: learned_fast_rollout(
            DYN, best, s, k, STEPS), 8, SELECT_SEED0)
        log({"item": "trained", "label": label, "select_score": sel,
             "train_final_best": hist[-1]["best"], "wall_s": round(wall, 1)})
        results.append((sel, label, best))

    sel, label, best = max(results, key=lambda r: r[0])
    held = heldout(lambda s, k: learned_fast_rollout(
        DYN, best, s, k, STEPS), 32, HELDOUT_SEED0)
    art = f"docs/artifacts/lattice{args.dirs}_linear.npz"
    np.savez(art, params=np.asarray(best))
    log({"item": "selected_heldout", "dirs": args.dirs, "label": label,
         "heldout": held, "artifact": art})


if __name__ == "__main__":
    main()
