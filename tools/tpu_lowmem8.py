"""Round-4 A/B: 8-dir whole-field kernel with staged roll lists (default)
vs the on-demand lowmem roll form that won the 16-dir round (DIE_TPU_LOWMEM=1).

Bitwise-identical by construction (rolls are exact permutations; the
dirf == d select masks are disjoint-complete — CPU-checked before running).
Appends JSONL to tools/tpu_lowmem8_log.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(rec):
    rec = dict(rec, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    print(json.dumps(rec), flush=True)
    with open("tools/tpu_lowmem8_log.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    from die_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

    B, T, F = 64, 256, 256
    dyn = FastDynamics()

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(np.asarray(f(x)))
    off = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        off = min(off, time.perf_counter() - t0)
    log({"null_offset_ms": round(off * 1e3, 1),
         "backend": jax.default_backend()})

    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(lambda k: fast_init_jax(k, (F, F), dyn)))(keys)
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))

    for lm in ("0", "1"):
        os.environ["DIE_TPU_LOWMEM"] = lm
        try:
            run = jax.jit(lambda s, k: jnp.sum(jax.vmap(
                lambda ss, kk: pallas_fast_rollout_multi(
                    dyn, ss, kk, T, num_inner=256)[1])(s, k)))
            t0 = time.perf_counter()
            r = float(np.asarray(run(states, rkeys)))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(run(states, rkeys)))
                best = min(best, time.perf_counter() - t0)
            log({"lowmem": lm, "env_steps_per_s":
                 round(B * T / max(best - off, 1e-9), 1),
                 "compile_s": round(compile_s, 1), "reward_sum": r,
                 "B": B, "T": T, "F": F})
        except Exception as e:
            log({"lowmem": lm, "error": str(e)[:500]})
    os.environ.pop("DIE_TPU_LOWMEM", None)


if __name__ == "__main__":
    main()
