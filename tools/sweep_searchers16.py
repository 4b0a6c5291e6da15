"""Round-5 searcher-axis sweep on the COMMITTED 16-dir artifacts
(VERDICT r4 weak #2: "the searcher axis is unexplored while the speed
axis makes such sweeps nearly free"): resume the linear 662.3 and conv
692.9 record centers under full-covariance CMAES and big-population PGPE,
cold restarts included, to test whether the warm-start plateau is a
searcher artifact or a landscape property.

Protocol: the pinned learning-eval protocol; selection on 8 envs at seed
block 20_000, held-out 32 envs at 10_000 reported for anything that beats
its artifact's select score.  Appends to tools/sweep_searchers16_log.jsonl.
"""
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np


def log(rec):
    rec = dict(rec, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    print(json.dumps(rec), flush=True)
    with open("tools/sweep_searchers16_log.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="linear,conv")
    ap.add_argument("--only", default=None)
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
        learned_fast_rollout,
        train_lattice,
    )
    from die_tpu.fast.nca import (
        ConvTurnParams,
        conv_nca_rollout,
        train_conv_nca,
    )
    from die_tpu.fast.rollout import fast_rollout
    from die_tpu.learn.es import CMAES

    DYN = eval_protocol_dynamics(16)
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
    log({"item": "jones_select", "score": jones})

    def want(label):
        return args.only is None or label in args.only.split(",")

    # ---------------- linear family (kernel-speed training) ----------------
    if "linear" in args.family.split(","):
        lin0 = jnp.asarray(
            np.load("docs/artifacts/lattice16_linear.npz")["params"])
        lin_sel = heldout(lambda s, k: learned_fast_rollout(
            DYN, lin0, s, k, STEPS), 8, SELECT_SEED0)
        log({"item": "linear_artifact_select", "score": lin_sel})

        results = [(lin_sel, "artifact", np.asarray(lin0))]
        CONFIGS = [
            ("lin_cma_s002", 300, 64, 0,
             lambda d: CMAES(d, popsize=64, stdev_init=0.02)),
            ("lin_cma_s01", 300, 64, 1,
             lambda d: CMAES(d, popsize=64, stdev_init=0.1)),
            ("lin_pgpe_p256", 200, 256, 2, None),
            ("lin_pgpe_p256_r015", 200, 256, 3, None),
        ]
        for label, epochs, pop, seed, sf in CONFIGS:
            if not want(label):
                continue
            radius = 0.15 if label.endswith("r015") else 0.5
            cfg = LatticeTrainConfig(field_size=(64, 128), epochs=epochs,
                                     epoch_iters=STEPS, popsize=pop,
                                     envs_per_eval=8, seed=seed)
            t0 = time.perf_counter()
            try:
                best, _, hist = train_lattice(
                    DYN, cfg, params_init=lin0, common_random_envs=True,
                    radius_init=radius, searcher_fn=sf)
            except Exception as e:
                log({"item": label, "error": str(e)[:300]})
                traceback.print_exc()
                continue
            wall = time.perf_counter() - t0
            bestj = jnp.asarray(best)
            sel = heldout(lambda s, k: learned_fast_rollout(
                DYN, bestj, s, k, STEPS), 8, SELECT_SEED0)
            log({"item": "trained", "label": label, "select_score": sel,
                 "train_final_best": hist[-1]["best"],
                 "wall_s": round(wall, 1)})
            results.append((sel, label, np.asarray(best)))

        sel, label, best = max(results, key=lambda r: r[0])
        if label != "artifact":
            bestj = jnp.asarray(best)
            held = heldout(lambda s, k: learned_fast_rollout(
                DYN, bestj, s, k, STEPS), 32, HELDOUT_SEED0)
            log({"item": "linear_best_heldout", "label": label,
                 "heldout": held})
            np.savez("docs/artifacts/lattice16_linear_r5.npz", params=best)
        else:
            log({"item": "linear_no_improvement", "artifact_select": sel})

    # ---------------- conv family (XLA path; the 692.9 record) -------------
    if "conv" in args.family.split(","):
        data = np.load("docs/artifacts/lattice16_conv_beats_jones.npz")
        conv0 = ConvTurnParams(conv=jnp.asarray(data["conv"]),
                               head=jnp.asarray(data["head"]),
                               bias=jnp.asarray(data["bias"]))
        conv_sel = heldout(lambda s, k: conv_nca_rollout(
            DYN, conv0, s, k, STEPS), 8, SELECT_SEED0)
        log({"item": "conv_artifact_select", "score": conv_sel})

        results = [(conv_sel, "artifact", conv0)]
        CONFIGS = [
            ("conv_cma_s002", 150, 32, 0,
             lambda d: CMAES(d, popsize=32, stdev_init=0.02)),
            ("conv_cma_s005", 150, 32, 1,
             lambda d: CMAES(d, popsize=32, stdev_init=0.05)),
            ("conv_pgpe_p128", 150, 128, 2, None),
        ]
        for label, epochs, pop, seed, sf in CONFIGS:
            if not want(label):
                continue
            cfg = LatticeTrainConfig(field_size=(SIZE, SIZE), epochs=epochs,
                                     epoch_iters=STEPS, popsize=pop,
                                     envs_per_eval=8, seed=seed)
            t0 = time.perf_counter()
            try:
                best, _, hist = train_conv_nca(
                    DYN, cfg, hidden=8, common_random_envs=True,
                    params_init=conv0, radius_init=0.15,
                    center_learning_rate=0.02, max_speed=0.05,
                    searcher_fn=sf)
            except Exception as e:
                log({"item": label, "error": str(e)[:300]})
                traceback.print_exc()
                continue
            wall = time.perf_counter() - t0
            sel = heldout(lambda s, k: conv_nca_rollout(
                DYN, best, s, k, STEPS), 8, SELECT_SEED0)
            log({"item": "trained", "label": label, "select_score": sel,
                 "train_final_best": hist[-1]["best"],
                 "wall_s": round(wall, 1)})
            results.append((sel, label, best))

        sel, label, best = max(results, key=lambda r: r[0])
        if label != "artifact":
            held = heldout(lambda s, k: conv_nca_rollout(
                DYN, best, s, k, STEPS), 32, HELDOUT_SEED0)
            log({"item": "conv_best_heldout", "label": label,
                 "heldout": held})
            np.savez("docs/artifacts/lattice16_conv_r5.npz",
                     conv=np.asarray(best.conv), head=np.asarray(best.head),
                     bias=np.asarray(best.bias))
        else:
            log({"item": "conv_no_improvement", "artifact_select": sel})


if __name__ == "__main__":
    main()
