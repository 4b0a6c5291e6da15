#!/usr/bin/env python
"""Warm-started conv-NCA training on the TUNED 16-direction lattice.

Round-3 follow-up to tools/sweep_conv_nca16.py, whose cold CRN-ES runs all
collapsed to the keep-only straight-runner (held-out 172.5 vs tuned Jones
653.6 — ROADMAP 'round 3').  The diagnosis was that the landscape needs
initialization from the Jones rule's behavior, not a bigger budget; this
script provides it: PGPE starts at ``jones_mimic_conv_params`` (a
hand-constructed bitwise-checkable imitation of the Jones argmax, which
already scores 669.1 held-out — above Jones — thanks to deterministic
tie-keeping) and fine-tunes with common-random-numbers fitness.

Protocol identical to the cold sweep (held-out seed block 10_000, 64x64,
50 steps, 32 seeds).  Appends JSONL to tools/sweep_conv_nca16_warm_log
.jsonl; saves a winning checkpoint to
docs/artifacts/lattice16_conv_beats_jones.npz.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

from die_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.fast.config import tuned_dynamics
from die_tpu.fast.learned import LatticeTrainConfig
from die_tpu.fast.nca import (
    ConvTurnParams,
    conv_nca_rollout,
    jones_mimic_conv_params,
    train_conv_nca,
)
from die_tpu.fast.rollout import fast_rollout

LOG = "/root/repo/tools/sweep_conv_nca16_warm_log.jsonl"
SIZE, STEPS, SEEDS, SEED0 = 64, 50, 32, 10_000
DYN = tuned_dynamics(16, init_agent_ratio=0.15, food_infinite=True)


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")


def heldout(roll_fn):
    def one(i):
        from die_tpu.fast.init import fast_init_jax

        st = fast_init_jax(jr.fold_in(jr.PRNGKey(SEED0), i),
                           (SIZE, SIZE), DYN)
        _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(SEED0 + 1), i))
        return jnp.sum(rewards)

    totals = jax.jit(jax.vmap(one))(jnp.arange(SEEDS))
    return float(np.asarray(jnp.mean(totals)))


def main():
    jones = heldout(lambda s, k: fast_rollout(DYN, s, k, STEPS))
    log(item="jones16_tuned", heldout=round(jones, 1))

    mimic = jones_mimic_conv_params(gain=32.0)
    mim = heldout(lambda s, k: conv_nca_rollout(DYN, mimic, s, k, STEPS))
    log(item="mimic_gain32", heldout=round(mim, 1),
        vs_jones=round(mim / jones, 3))

    configs = [
        # (tag, epochs, popsize, envs_per_eval, radius, lr, max_speed, seed)
        ("warm_r015", 200, 64, 8, 0.15, 0.02, 0.05, 11),
        ("warm_r05", 200, 64, 8, 0.5, 0.05, 0.1, 12),
    ]
    if len(sys.argv) > 1:
        want = set(sys.argv[1].split(","))
        configs = [c for c in configs if c[0] in want]

    best_overall, best_tag, best_params = mim, "mimic_gain32", mimic
    for tag, epochs, pop, epe, rad, lr, ms, seed in configs:
        t0 = time.time()
        try:
            cfg = LatticeTrainConfig(field_size=(SIZE, SIZE), epochs=epochs,
                                     epoch_iters=STEPS, popsize=pop,
                                     envs_per_eval=epe, seed=seed)
            params, _, hist = train_conv_nca(
                DYN, cfg, hidden=8, center_learning_rate=lr,
                radius_init=rad, max_speed=ms, common_random_envs=True,
                params_init=mimic)
            score = heldout(lambda s, k: conv_nca_rollout(
                DYN, params, s, k, STEPS))
            log(item=tag, heldout=round(score, 1),
                train_best=round(max(h["best"] for h in hist), 1),
                vs_jones=round(score / jones, 3),
                wall_s=round(time.time() - t0, 1))
            if score > best_overall:
                best_overall, best_tag, best_params = score, tag, params
        except Exception as e:
            log(item=tag, error=str(e)[:300])
            traceback.print_exc()

    log(item="sweep_best", tag=best_tag, heldout=round(best_overall, 1),
        jones=round(jones, 1))
    if best_params is not None and best_overall > jones:
        out = "/root/repo/docs/artifacts/lattice16_conv_beats_jones.npz"
        np.savez(out, conv=np.asarray(best_params.conv),
                 head=np.asarray(best_params.head),
                 bias=np.asarray(best_params.bias))
        log(item="saved", path=out, tag=best_tag)


if __name__ == "__main__":
    main()
