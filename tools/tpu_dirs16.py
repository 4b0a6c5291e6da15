"""Round-4 measurement: the tuned 16-direction lattice at 256x256 (VERDICT
r3 item 1 — the fidelity/speed split).

Measures, in careful order (known-good first, risky compile last):
  1. tunnel probe (tiny jit)
  2. banded kernel baseline (the round-3 auto-route: 4 bands)
  3. XLA scan path
  4. whole-field K-step kernel attempt (round-3: remote-compile VMEM crash)

Timing per docs/PERF.md: null-offset subtraction, scalar sync via
np.asarray, T >= 128.  Appends JSONL to tools/tpu_dirs16_log.jsonl.

Run:  python tools/tpu_dirs16.py [--envs 64] [--steps 256]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(rec):
    rec = dict(rec, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    print(json.dumps(rec), flush=True)
    with open("tools/tpu_dirs16_log.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip", default="",
                    help="comma list of measurements to skip "
                         "(banded,xla,banded2,whole)")
    ap.add_argument("--whole", default="rotate:move rotate:move,acc "
                    "rotate:sense,move,acc switch:move",
                    help="space list of kind:phases whole-field variants")
    ap.add_argument("--inner", type=int, default=32,
                    help="K-step fusion depth for the whole-field kernel")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    from die_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import tuned_dynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.rollout import fast_rollout

    B, T, F = args.envs, args.steps, 256
    dyn = tuned_dynamics(16)

    # 1. tunnel probe + null offset
    t0 = time.perf_counter()
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(np.asarray(f(x)))
    log({"probe_s": round(time.perf_counter() - t0, 1),
         "backend": jax.default_backend()})
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        best = min(best, time.perf_counter() - t0)
    off = best
    log({"null_offset_ms": round(off * 1e3, 1)})

    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(lambda k: fast_init_jax(k, (F, F), dyn)))(keys)
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))

    def timed(name, roll, **extra):
        try:
            run = jax.jit(lambda s, k: jnp.sum(
                jax.vmap(lambda ss, kk: roll(ss, kk)[1])(s, k)))
            t0 = time.perf_counter()
            r0 = float(np.asarray(run(states, rkeys)))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                r = float(np.asarray(run(states, rkeys)))
                best = min(best, time.perf_counter() - t0)
            v = B * T / max(best - off, 1e-9)
            log(dict(extra, name=name, env_steps_per_s=round(v, 1),
                     compile_s=round(compile_s, 1), reward_sum=r,
                     warm_reward_sum=r0, B=B, T=T, F=F))
            return v
        except Exception as e:
            log(dict(extra, name=name, error=str(e)[:500], B=B, T=T, F=F))
            return None

    # 2. banded baseline (round-3 auto-route)
    if "banded" not in skip:
        from die_tpu.fast.pallas_step import pallas_banded_rollout

        timed("banded4", lambda s, k: pallas_banded_rollout(
            dyn, s, k, T, num_bands=4), bands=4)

    # 3. XLA scan
    if "xla" not in skip:
        timed("xla_scan", lambda s, k: fast_rollout(dyn, s, k, T))

    # 2b. banded with 2 bands (less halo recompute: 1.25x vs 1.5x rows)
    if "banded2" not in skip:
        from die_tpu.fast.pallas_step import pallas_banded_rollout

        timed("banded2", lambda s, k: pallas_banded_rollout(
            dyn, s, k, T, num_bands=2), bands=2)

    # 4. whole-field K-step kernel (round-3: VMEM overflow at 256^2;
    # round-4 loop restructure — A/B over roll kind and looped-phase set)
    if "whole" not in skip:
        import os as _o

        import die_tpu.fast.env as fenv
        from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

        for spec in args.whole.split():
            kind, phases = spec.split(":", 1)
            fenv._DYNROLL_KIND = kind
            _o.environ["DIE_TPU_DYNPHASES"] = phases
            timed(f"whole_{kind}_{phases}_K{args.inner}",
                  lambda s, k: pallas_fast_rollout_multi(
                      dyn, s, k, T, num_inner=args.inner),
                  kind=kind, phases=phases, K=args.inner)
        fenv._DYNROLL_KIND = "switch"
        _o.environ.pop("DIE_TPU_DYNPHASES", None)


if __name__ == "__main__":
    main()
