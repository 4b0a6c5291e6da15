#!/usr/bin/env python
"""Warm-started conv-NCA training on the 4- and 8-direction lattices.

Extends the 16-dir warm-start result (tools/sweep_conv_nca16_warm.py:
mimic-init CRN-PGPE 692.9 vs tuned Jones 653.6) to the other lattices:

- 4-dir: cold conv-NCA training was never attempted here (the round-2
  sweeps trained 8-dir only); start from jones_mimic_conv_params and
  fine-tune.  Jones at the 8-dir defaults scores ~554 held-out
  (BASELINE.md) — the bar.
- 8-dir: the committed artifact (docs/artifacts/lattice_conv_beats_jones
  .npz, held-out 340.5 vs Jones 283.1) came from a cold CRN run; resume
  CRN-PGPE FROM that artifact to see if the round-2 run had converged.

Protocol identical to the other sweeps (held-out seed block 10_000,
64x64, 50 steps, 32 seeds; CRN fitness).  Appends JSONL to
tools/sweep_conv_nca_warm48_log.jsonl; saves improved checkpoints to
docs/artifacts/lattice{4,8}_conv_*.npz (the 8-dir original is kept —
its regression test pins the committed file).
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

from die_tpu.fast.config import FastDynamics, tuned_dynamics
from die_tpu.fast.learned import LatticeTrainConfig
from die_tpu.fast.nca import (
    ConvTurnParams,
    conv_nca_rollout,
    jones_mimic_conv_params,
    train_conv_nca,
)
from die_tpu.fast.rollout import fast_rollout

LOG = "/root/repo/tools/sweep_conv_nca_warm48_log.jsonl"
ART = "/root/repo/docs/artifacts"
SIZE, STEPS, SEEDS, SEED0 = 64, 50, 32, 10_000


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")


def heldout(dyn, roll_fn):
    def one(i):
        from die_tpu.fast.init import fast_init_jax

        st = fast_init_jax(jr.fold_in(jr.PRNGKey(SEED0), i),
                           (SIZE, SIZE), dyn)
        _, rewards, _ = roll_fn(st, jr.fold_in(jr.PRNGKey(SEED0 + 1), i))
        return jnp.sum(rewards)

    totals = jax.jit(jax.vmap(one))(jnp.arange(SEEDS))
    return float(np.asarray(jnp.mean(totals)))


def load_params(path):
    d = np.load(path)
    return ConvTurnParams(conv=jnp.asarray(d["conv"]),
                          head=jnp.asarray(d["head"]),
                          bias=jnp.asarray(d["bias"]))


def run_block(name, dyn, init_params, configs, out_path):
    jones = heldout(dyn, lambda s, k: fast_rollout(dyn, s, k, STEPS))
    log(item=f"{name}_jones", heldout=round(jones, 1))
    init_score = heldout(dyn, lambda s, k: conv_nca_rollout(
        dyn, init_params, s, k, STEPS))
    log(item=f"{name}_init", heldout=round(init_score, 1),
        vs_jones=round(init_score / jones, 3))

    best_overall, best_tag, best_params = init_score, f"{name}_init", None
    for tag, epochs, rad, lr, ms, seed in configs:
        t0 = time.time()
        try:
            cfg = LatticeTrainConfig(field_size=(SIZE, SIZE), epochs=epochs,
                                     epoch_iters=STEPS, popsize=64,
                                     envs_per_eval=8, seed=seed)
            params, _, hist = train_conv_nca(
                dyn, cfg, hidden=8, center_learning_rate=lr,
                radius_init=rad, max_speed=ms, common_random_envs=True,
                params_init=init_params)
            score = heldout(dyn, lambda s, k: conv_nca_rollout(
                dyn, params, s, k, STEPS))
            log(item=f"{name}_{tag}", heldout=round(score, 1),
                train_best=round(max(h["best"] for h in hist), 1),
                vs_jones=round(score / jones, 3),
                wall_s=round(time.time() - t0, 1))
            if score > best_overall:
                best_overall, best_tag, best_params = score, tag, params
        except Exception as e:
            log(item=f"{name}_{tag}", error=str(e)[:300])
            traceback.print_exc()

    log(item=f"{name}_best", tag=best_tag, heldout=round(best_overall, 1),
        jones=round(jones, 1))
    if best_params is not None and best_overall > max(jones, init_score):
        np.savez(out_path, conv=np.asarray(best_params.conv),
                 head=np.asarray(best_params.head),
                 bias=np.asarray(best_params.bias))
        log(item=f"{name}_saved", path=out_path, tag=best_tag)


def main():
    blocks = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {"4", "8"}

    if "4" in blocks:
        dyn4 = tuned_dynamics(4, init_agent_ratio=0.15, food_infinite=True)
        run_block("dir4", dyn4, jones_mimic_conv_params(gain=32.0),
                  [("warm_r05", 200, 0.5, 0.05, 0.1, 21),
                   ("warm_r015", 200, 0.15, 0.02, 0.05, 22)],
                  os.path.join(ART, "lattice4_conv_beats_jones.npz"))

    if "8" in blocks:
        dyn8 = FastDynamics(init_agent_ratio=0.15, food_infinite=True)
        art = load_params(os.path.join(ART, "lattice_conv_beats_jones.npz"))
        run_block("dir8", dyn8, art,
                  [("resume_r015", 200, 0.15, 0.02, 0.05, 31),
                   ("resume_r05", 200, 0.5, 0.05, 0.1, 32)],
                  os.path.join(ART, "lattice8_conv_resumed.npz"))


if __name__ == "__main__":
    main()
