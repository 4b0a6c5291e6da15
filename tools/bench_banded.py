#!/usr/bin/env python
"""Banded-kernel throughput at large fields: double-buffered DMA vs the
round-1 single-buffered path vs the XLA scan.  Appends to
tools/tpu_measure_log.jsonl.

Usage: python tools/bench_banded.py [field_w] [field_h]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.pallas_step import pallas_banded_rollout_batch
from die_tpu.fast.rollout import choose_bands, fast_rollout
from die_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
LOG_PATH = "/root/repo/tools/tpu_measure_log.jsonl"


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG_PATH, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timed(f, *a, reps=3):
    r = f(*a)
    float(np.asarray(jnp.sum(r[1])))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        float(np.asarray(jnp.sum(r[1])))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    H = int(sys.argv[2]) if len(sys.argv) > 2 else W
    dyn = FastDynamics()
    B = 32 if W <= 512 else 8
    T = 16
    bands = choose_bands(dyn, W, H)
    log(item="banded_cfg", W=W, H=H, B=B, T=T, bands=bands)

    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(lambda k: fast_init_jax(k, (W, H), dyn)))(keys)
    # the banded batch API carries ONE shared flow_step for the lockstep
    # batch (vmapped init produces a per-env copy)
    states_b = states._replace(flow_step=jnp.zeros((), jnp.int32))
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))

    variants = [(bands, 1, False, "single_buf"),
                (bands, 1, True, "double_buf")]
    if bands > 2:
        variants += [(bands // 2, 1, True, f"double_buf_b{bands // 2}")]
    variants += [(bands, 2, True, "double_buf_k2")]
    for nb, k_in, db, tag in variants:
        if T % k_in:
            continue
        run = jax.jit(lambda s, k, nb=nb, k_in=k_in, db=db:
                      pallas_banded_rollout_batch(
                          dyn, s, k, T, num_bands=nb, num_inner=k_in,
                          double_buffer=db))
        try:
            b = timed(run, states_b, rkeys)
            log(item=f"banded_{tag}_{W}x{H}",
                env_steps_per_s=round(B * T / b, 1))
        except Exception as e:
            log(item=f"banded_{tag}_{W}x{H}", error=str(e)[:300])

    run_x = jax.jit(lambda s, k: jax.vmap(
        lambda ss, kk: fast_rollout(dyn, ss, kk, T))(s, k))
    try:
        b = timed(run_x, states, rkeys)
        log(item=f"banded_xla_{W}x{H}", env_steps_per_s=round(B * T / b, 1))
    except Exception as e:
        log(item=f"banded_xla_{W}x{H}", error=str(e)[:300])


if __name__ == "__main__":
    main()
