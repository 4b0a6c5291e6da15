#!/usr/bin/env python
"""Banded-kernel throughput at large fields, vs the XLA scan.

Methodology (round 2 correction): every host-side timed call through the
axon tunnel carries a fixed ~24 ms dispatch+sync round trip REGARDLESS of
device work (measured: a trivial jitted op, a 16-iter pallas scan, and a
4096-iter XLA scan all cost the same ~24 ms per call).  Small-T runs are
therefore dominated by the tunnel, not the device — the round-1/round-2
"22 us/program grid overhead" readings were this artifact.  This bench
measures the null-call offset and subtracts it, and uses T large enough
that the offset is <10% anyway.  Appends to tools/tpu_measure_log.jsonl.

Usage: python tools/bench_banded.py [field_w] [field_h] [T]
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


def null_offset():
    """Fixed per-call tunnel cost: dispatch + scalar-sync round trip."""
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: (x, x + 1.0))
    return timed(f, x, reps=5)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    H = int(sys.argv[2]) if len(sys.argv) > 2 else W
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    dyn = FastDynamics()
    B = 32 if W <= 512 else 8
    bands = choose_bands(dyn, W, H)
    off = null_offset()
    log(item="banded_cfg", W=W, H=H, B=B, T=T, bands=bands,
        null_offset_ms=round(off * 1e3, 2))

    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(lambda k: fast_init_jax(k, (W, H), dyn)))(keys)
    # the banded batch API carries ONE shared flow_step for the lockstep
    # batch (vmapped init produces a per-env copy)
    states_b = states._replace(flow_step=jnp.zeros((), jnp.int32))
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))

    variants = [(bands, 1, False, "single_buf"),
                (bands, 1, True, "double_buf"),
                (bands, 2, True, "double_buf_k2")]
    if bands > 2:
        variants += [(bands // 2, 1, True, f"double_buf_b{bands // 2}")]
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
                env_steps_per_s=round(B * T / (b - off), 1),
                raw_with_tunnel=round(B * T / b, 1))
        except Exception as e:
            log(item=f"banded_{tag}_{W}x{H}", error=str(e)[:300])

    run_x = jax.jit(lambda s, k: jax.vmap(
        lambda ss, kk: fast_rollout(dyn, ss, kk, T))(s, k))
    try:
        b = timed(run_x, states, rkeys)
        log(item=f"banded_xla_{W}x{H}",
            env_steps_per_s=round(B * T / (b - off), 1),
            raw_with_tunnel=round(B * T / b, 1))
    except Exception as e:
        log(item=f"banded_xla_{W}x{H}", error=str(e)[:300])


if __name__ == "__main__":
    main()
