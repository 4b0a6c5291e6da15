#!/usr/bin/env python
"""Overhead attribution for the banded kernel: where do the ~22 us/program
go at 512^2 / 4 bands?  Runs the double-buffered kernel with pieces disabled
(_debug knob in make_pallas_banded_step):

  full       — the shipped kernel
  nocompute  — DMA + grid machinery only (step body skipped)
  nodma      — compute + grid machinery only (copies only on grid step 0)
  grid       — grid machinery only

Appends to tools/tpu_measure_log.jsonl.
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
from die_tpu.fast.pallas_step import (make_pallas_banded_step,
                                      site_keys_for_step)
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
    H, B, T, bands = W, 32 if W <= 512 else 8, 16, 4 if W <= 512 else 16
    dyn = FastDynamics()
    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(lambda k: fast_init_jax(k, (W, H), dyn)))(keys)
    states_b = states._replace(flow_step=jnp.zeros((), jnp.int32))
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))
    site = jax.vmap(lambda k: jax.vmap(
        lambda t: site_keys_for_step(k, t))(jnp.arange(1)))(rkeys)

    programs = B * bands * T
    for mode in [None, "nocompute", "nodma", "grid"]:
        for db in [True, False]:
            step = make_pallas_banded_step(dyn, (W, H), bands, batch=B,
                                           double_buffer=db, _debug=mode)

            def run(s, sk):
                def body(carry, _):
                    st, rew, num = step(carry, sk)
                    return st, rew

                return jax.lax.scan(body, s, None, length=T)

            runj = jax.jit(run)
            try:
                best = timed(runj, states_b, site)
                log(item=f"attr_{mode or 'full'}_{'db' if db else 'sb'}_{W}",
                    env_steps_per_s=round(B * T / best, 1),
                    us_per_program=round(best / programs * 1e6, 2))
            except Exception as e:
                log(item=f"attr_{mode or 'full'}_{'db' if db else 'sb'}_{W}",
                    error=str(e)[:200])


if __name__ == "__main__":
    main()
