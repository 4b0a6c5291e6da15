"""Retune the 16-direction lattice (round-3 VERDICT item 5).

At the 8-dir-tuned defaults the 16-direction lattice — the closest analog
of the reference Physarum's 30-degree turns
(/root/reference/core/agent/gradient.py:145) — forages at 28 vs 276
(8-dir) held-out mean episode reward.  Knight offsets traverse 2 cells
per hop, so sensing reaches twice as far and trails are jumped over;
sense/deposit/diffusion need their own operating point.

Protocol: eval_lattice's foraging setup (64x64, 50 steps,
init_agent_ratio 0.15, food_infinite) — SELECTION on seed block 20000
(8 seeds), disjoint from the held-out block 10000 used for reporting.
Grid over sense_dist x deposit_coef x rate_decay_chem x diffuse_sigma,
then the top configs re-scored on 16 selection seeds.  Prints JSONL.

Run: DIE_TPU_CPU=1 python tools/sweep_dirs16.py
"""
import itertools
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("DIE_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.rollout import fast_rollout

SIZE, STEPS = 64, 50
SELECT_SEED0 = 20_000   # selection block — DISJOINT from held-out 10_000
HELDOUT_SEED0 = 10_000


def heldout(dyn, num_seeds, seed0):
    def one(i):
        st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i),
                           (SIZE, SIZE), dyn)
        _, rewards, _ = fast_rollout(dyn, st, jr.fold_in(
            jr.PRNGKey(seed0 + 1), i), STEPS)
        return jnp.sum(rewards)

    totals = jax.jit(jax.vmap(one))(jnp.arange(num_seeds))
    return float(np.asarray(jnp.mean(totals)))


def refine():
    """Stage 2: refine around the stage-1 winner (sense=2, dep=2,
    decay=0.05, sigma=1.0 -> held-out 214.1) over deposit/decay/sigma/
    idle_deposit; report the best on the held-out block."""
    base = dict(num_dirs=16, init_agent_ratio=0.15, food_infinite=True,
                sense_dist=2)
    grid = list(itertools.product(
        (1.0, 2.0, 3.0),          # deposit_coef
        (0.025, 0.05),            # rate_decay_chem
        (0.8, 1.0, 1.5),          # diffuse_sigma
        (0.05, 0.1, 0.2),         # idle_deposit
    ))
    results = []
    for dep, dec, sig, idle in grid:
        dyn = FastDynamics(deposit_coef=dep, rate_decay_chem=dec,
                           diffuse_sigma=sig, idle_deposit=idle, **base)
        v = heldout(dyn, 8, SELECT_SEED0)
        results.append((v, dep, dec, sig, idle))
        print(json.dumps({"dep": dep, "decay": dec, "sigma": sig,
                          "idle": idle, "select8": round(v, 1)}), flush=True)
    results.sort(reverse=True)
    finalists = []
    for v, dep, dec, sig, idle in results[:5]:
        dyn = FastDynamics(deposit_coef=dep, rate_decay_chem=dec,
                           diffuse_sigma=sig, idle_deposit=idle, **base)
        v16 = heldout(dyn, 16, SELECT_SEED0)
        finalists.append((v16, dep, dec, sig, idle))
        print(json.dumps({"finalist": [dep, dec, sig, idle],
                          "select16": round(v16, 1)}), flush=True)
    finalists.sort(reverse=True)
    _, dep, dec, sig, idle = finalists[0]
    best = FastDynamics(deposit_coef=dep, rate_decay_chem=dec,
                        diffuse_sigma=sig, idle_deposit=idle, **base)
    v_held = heldout(best, 32, HELDOUT_SEED0)
    print(json.dumps({"item": "refined_16dir_heldout",
                      "config": {"sense_dist": 2, "deposit_coef": dep,
                                 "rate_decay_chem": dec,
                                 "diffuse_sigma": sig,
                                 "idle_deposit": idle},
                      "reward": round(v_held, 1)}), flush=True)


def main():
    base = dict(num_dirs=16, init_agent_ratio=0.15, food_infinite=True)
    # baselines at defaults, held-out block (the BASELINE.md numbers)
    for nd in (8, 16):
        v = heldout(FastDynamics(num_dirs=nd, init_agent_ratio=0.15,
                                 food_infinite=True), 32, HELDOUT_SEED0)
        print(json.dumps({"item": f"default_{nd}dir_heldout",
                          "reward": round(v, 1)}), flush=True)

    grid = list(itertools.product(
        (1, 2, 3, 4, 5),        # sense_dist (knight hops reach 2x rows)
        (2.0, 4.0, 8.0),        # deposit_coef
        (0.05, 0.1),            # rate_decay_chem
        (0.5, 1.0),             # diffuse_sigma
    ))
    results = []
    for sd, dep, dec, sig in grid:
        dyn = FastDynamics(sense_dist=sd, deposit_coef=dep,
                           rate_decay_chem=dec, diffuse_sigma=sig, **base)
        v = heldout(dyn, 8, SELECT_SEED0)
        results.append((v, sd, dep, dec, sig))
        print(json.dumps({"sense": sd, "dep": dep, "decay": dec,
                          "sigma": sig, "select8": round(v, 1)}), flush=True)

    results.sort(reverse=True)
    finalists = []
    for v, sd, dep, dec, sig in results[:5]:
        dyn = FastDynamics(sense_dist=sd, deposit_coef=dep,
                           rate_decay_chem=dec, diffuse_sigma=sig, **base)
        v16 = heldout(dyn, 16, SELECT_SEED0)
        finalists.append((v16, sd, dep, dec, sig))
        print(json.dumps({"finalist": [sd, dep, dec, sig],
                          "select16": round(v16, 1)}), flush=True)

    finalists.sort(reverse=True)
    _, sd, dep, dec, sig = finalists[0]
    best = FastDynamics(sense_dist=sd, deposit_coef=dep,
                        rate_decay_chem=dec, diffuse_sigma=sig, **base)
    v_held = heldout(best, 32, HELDOUT_SEED0)
    print(json.dumps({"item": "tuned_16dir_heldout",
                      "config": {"sense_dist": sd, "deposit_coef": dep,
                                 "rate_decay_chem": dec,
                                 "diffuse_sigma": sig},
                      "reward": round(v_held, 1)}), flush=True)


if __name__ == "__main__":
    if "--refine" in sys.argv:
        refine()
    else:
        main()
