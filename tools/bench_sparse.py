#!/usr/bin/env python
"""Sparse (agent-list) vs field-centric lattice engine A/B on the real TPU.

The round-3 measurement (VERDICT item 1): does an agent-centric formulation
paying per-AGENT gather/scatter costs beat the field-centric kernel paying
~248 elementwise ops on every cell, at the benchmark's ~15% occupancy — and
if not, where is the occupancy crossover?

Method: offset-subtracted timing (the fixed ~24-30 ms axon per-call
constant, docs/PERF.md round-2 correction), scalar-sync via np.asarray,
best of REPS.  Both engines run the identical dynamics (bitwise-verified in
tests/test_sparse_lattice.py).  One JSONL line per measurement.

Usage: python tools/bench_sparse.py [--ratios 0.15,0.02,0.005] [--envs 256]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def null_offset(reps=5):
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(np.asarray(f(x)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratios", default="0.15,0.02,0.005")
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--field", type=int, default=256)
    ap.add_argument("--steps-sparse", type=int, default=8)
    ap.add_argument("--steps-field", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-field", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.rollout import fast_rollout_auto
    from die_tpu.fast.sparse import from_fast, sparse_rollout
    from die_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    off = null_offset()
    print(f"# null offset {off*1e3:.1f} ms, backend {jax.default_backend()}",
          file=sys.stderr)
    B, F = args.envs, args.field

    def timed(fn, *xs, reps=args.reps):
        float(np.asarray(fn(*xs)))  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn(*xs)))
            best = min(best, time.perf_counter() - t0)
        return best - off

    for ratio in [float(r) for r in args.ratios.split(",")]:
        dyn = FastDynamics(init_agent_ratio=ratio)
        keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i)
                        )(jnp.arange(B))
        states = jax.jit(jax.vmap(lambda k: fast_init_jax(k, (F, F), dyn))
                         )(keys)
        rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i)
                         )(jnp.arange(B))

        # ---- field-centric engine (the headline path) at this occupancy
        if not args.skip_field:
            Tf = args.steps_field

            @jax.jit
            def run_field(states, rkeys):
                _, rew, _ = jax.vmap(lambda s, k: fast_rollout_auto(
                    dyn, s, k, Tf, num_inner=Tf))(states, rkeys)
                return jnp.sum(rew)

            tf = timed(run_field, states, rkeys)
            vf = B * Tf / max(tf, 1e-9)
            print(json.dumps({"engine": "field", "ratio": ratio, "B": B,
                              "T": Tf, "steps_per_s": round(vf, 1)}),
                  flush=True)

        # ---- sparse engine: convert each env eagerly, pad to a common
        # capacity (multiple of the 2048 gather chunk)
        states_np = jax.tree.map(np.asarray, states)
        per_env = [from_fast(jax.tree.map(lambda x: x[b], states_np))
                   for b in range(B)]
        counts = [int(s.alive.sum()) for s in per_env]
        cap = -(-max(counts) // 2048) * 2048
        per_env = [from_fast(jax.tree.map(lambda x: x[b], states_np),
                             capacity=cap) for b in range(B)]
        sp = jax.tree.map(lambda *xs: jnp.stack(xs), *per_env)
        Ts = args.steps_sparse

        @jax.jit
        def run_sparse(sp, rkeys):
            _, rew, _ = jax.vmap(lambda s, k: sparse_rollout(
                dyn, s, k, Ts))(sp, rkeys)
            return jnp.sum(rew)

        ts = timed(run_sparse, sp, rkeys)
        vs = B * Ts / max(ts, 1e-9)
        print(json.dumps({"engine": "sparse", "ratio": ratio, "B": B,
                          "T": Ts, "capacity": cap,
                          "mean_agents": round(float(np.mean(counts)), 1),
                          "steps_per_s": round(vs, 1)}), flush=True)


if __name__ == "__main__":
    main()
