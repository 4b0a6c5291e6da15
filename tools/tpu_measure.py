#!/usr/bin/env python
"""Batched TPU measurement run (round-1 continuation): dtype packing,
roll costs, step-variant end-to-end numbers, MXU gather.

Appends one JSON line per result to tools/tpu_measure_log.jsonl so partial
progress survives a tunnel wedge.  Run under tmux; each item is guarded.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from die_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

LOG_PATH = "/root/repo/tools/tpu_measure_log.jsonl"


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG_PATH, "a") as f:
        f.write(json.dumps(kw) + "\n")


def sync(x):
    return float(np.asarray(x))


def timed(f, *a, reps=3):
    sync(f(*a))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def guard(name, fn):
    t0 = time.time()
    try:
        fn()
    except Exception as e:
        log(item=name, error=str(e)[:500], wall=round(time.time() - t0, 1))
        traceback.print_exc()


# ---------------------------------------------------------------- 0. poll
def poll():
    t0 = time.time()
    v = sync(jax.jit(lambda x: x + 1)(jnp.float32(1)))
    log(item="poll", ok=v == 2.0, secs=round(time.time() - t0, 1),
        backend=jax.devices()[0].platform)


# ------------------------------------------------- 1. dtype ALU microbench
# 4 independent chains x OPS ops/round x ROUNDS rounds over a 256x256 block,
# batched over B blocks: measures packed VPU throughput per dtype.
B_MICRO = 64
ROUNDS = 256
OPS = 16  # ops per chain per round (mul+add pairs or cmp+select pairs)


def make_micro(dtype, kind):
    shape = (256, 256)

    def kern(x_ref, o_ref):
        x0 = x_ref[:]
        chains = [x0 + dtype(i) for i in range(4)]

        def body(i, cs):
            out = []
            for x in cs:
                if kind == "fma":
                    for _ in range(OPS // 2):
                        x = x * dtype(0.999) + dtype(1e-3)
                elif kind == "cmpsel":
                    for _ in range(OPS // 2):
                        x = jnp.where(x > dtype(0.5), x * dtype(0.25),
                                      x + dtype(0.5))
                elif kind == "intops":
                    for _ in range(OPS // 2):
                        x = jnp.where(x > dtype(3), x - dtype(7), x + dtype(5))
                out.append(x)
            return tuple(out)

        chains = jax.lax.fori_loop(0, ROUNDS, body, tuple(chains))
        acc = chains[0]
        for c in chains[1:]:
            acc = jnp.maximum(acc, c)
        o_ref[:] = acc

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = jax.vmap(out)(x)
        return jnp.sum(y[:, 0, :64].astype(jnp.float32))

    x = jnp.zeros((B_MICRO, 256, 256), dtype)
    return run, x


def micro_dtypes():
    for kind, dtypes in (("fma", [jnp.float32, jnp.bfloat16]),
                         ("cmpsel", [jnp.float32, jnp.bfloat16]),
                         ("intops", [jnp.int32, jnp.int16, jnp.int8])):
        for dt in dtypes:
            name = f"alu_{kind}_{np.dtype(dt).name}"

            def one(dt=dt, kind=kind, name=name):
                run, x = make_micro(dt, kind)
                best = timed(run, x)
                ops = B_MICRO * 4 * OPS * ROUNDS * 256 * 256
                log(item=name, secs=round(best, 4),
                    teraops=round(ops / best / 1e12, 3))

            guard(name, one)


# ------------------------------------------------------- 2. roll microbench
def make_roll(dtype, axis, shift):
    """4 independent roll+add chains — roll THROUGHPUT, not latency."""
    shape = (256, 256)

    def kern(x_ref, o_ref):
        x0 = x_ref[:]
        chains = tuple(x0 + dtype(i) for i in range(4))

        def body(i, cs):
            return tuple(jnp.roll(x, shift, axis) + dtype(1) for x in cs)

        chains = jax.lax.fori_loop(0, ROUNDS // 4, body, chains)
        acc = chains[0]
        for c in chains[1:]:
            acc = jnp.maximum(acc, c)
        o_ref[:] = acc

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = jax.vmap(out)(x)
        return jnp.sum(y[:, 0, :64].astype(jnp.float32))

    x = jnp.zeros((B_MICRO, 256, 256), dtype)
    return run, x


def micro_rolls():
    for dt in (jnp.float32,):
        for axis, shift in ((0, 1), (0, 3), (1, 1), (1, 3)):
            name = f"roll_{np.dtype(dt).name}_ax{axis}_s{shift}"

            def one(dt=dt, axis=axis, shift=shift, name=name):
                run, x = make_roll(dt, axis, shift)
                best = timed(run, x)
                n = B_MICRO * (ROUNDS // 4) * 4 * 256 * 256
                log(item=name, secs=round(best, 4),
                    gelems=round(n / best / 1e9, 1))

            guard(name, one)


# ----------------------------------------- 3. end-to-end step variants
def e2e(tag, dyn, B=256, T=64):
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(
        lambda k: fast_init_jax(k, (256, 256), dyn)))(keys)
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))

    @jax.jit
    def run(states, rkeys):
        roll = lambda s, k: pallas_fast_rollout_multi(  # noqa: E731
            dyn, s, k, T, num_inner=T)
        _, rew, _ = jax.vmap(roll)(states, rkeys)
        return jnp.sum(rew)

    best = timed(run, states, rkeys)
    log(item=f"e2e_{tag}", secs=round(best, 4), B=B, T=T,
        env_steps_per_s=round(B * T / best, 1))


def e2e_variants():
    from die_tpu.fast.config import FastDynamics

    guard("e2e_default", lambda: e2e("default", FastDynamics()))
    guard("e2e_stepprio",
          lambda: e2e("stepprio", FastDynamics(per_cell_priority=False)))
    guard("e2e_4dir_stepprio",
          lambda: e2e("4dir_stepprio",
                      FastDynamics(num_dirs=4, per_cell_priority=False)))


# ----------------------------------------------------- 4. MXU gather bench
def mxu_gather_bench():
    from die_tpu.ops.mxu_gather import onehot_gather_flat

    M = 256 * 256
    N = 65536
    B = 64
    flat = jr.uniform(jr.PRNGKey(0), (B, M), jnp.float32)
    idx = jr.randint(jr.PRNGKey(1), (B, N), 0, M, jnp.int32)

    @jax.jit
    def run_mxu(flat, idx):
        out = jax.vmap(onehot_gather_flat)(flat, idx)
        return jnp.sum(out)

    @jax.jit
    def run_take(flat, idx):
        out = jax.vmap(lambda f, i: jnp.take(f, i))(flat, idx)
        return jnp.sum(out)

    b1 = timed(run_mxu, flat, idx)
    log(item="gather_mxu", secs=round(b1, 4),
        ns_per_elem=round(b1 / (B * N) * 1e9, 2))
    b2 = timed(run_take, flat, idx)
    log(item="gather_take", secs=round(b2, 4),
        ns_per_elem=round(b2 / (B * N) * 1e9, 2))


# ------------------------------- 5. in-kernel roll cost (ablation pairs)
def make_rollk(kind):
    """8-neighbor round: rolls vs same-shape ALU stand-in; K rounds.
    Cost(roll) = (t_rolls - t_alu) / (8 * K) per field traversal."""
    from die_tpu.fast.config import DIR_OFFSETS
    shape = (256, 256)
    K = 64

    def kern(x_ref, o_ref):
        def body(i, x):
            if kind == "rolls":
                up = jnp.roll(x, 1, 0)
                down = jnp.roll(x, -1, 0)
                ys = []
                for o in DIR_OFFSETS:
                    base = x if o[0] == 0 else (down if o[0] > 0 else up)
                    ys.append(base if o[1] == 0 else
                              jnp.roll(base, -o[1], 1))
            elif kind == "ptpu_rolls":
                up = pltpu.roll(x, 1, 0)
                down = pltpu.roll(x, 255, 0)
                ys = []
                for o in DIR_OFFSETS:
                    base = x if o[0] == 0 else (down if o[0] > 0 else up)
                    ys.append(base if o[1] == 0 else
                              pltpu.roll(base, (o[1]) % 256, 1))
            else:  # alu stand-in: 8 muls
                ys = [x * np.float32(0.1 + 0.01 * i) for i in range(8)]
            acc = ys[0]
            for y in ys[1:]:
                acc = acc + y
            return x * np.float32(0.5) + acc * np.float32(0.0625)

        o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = jax.vmap(out)(x)
        return jnp.sum(y[:, 0, :64])

    x = jnp.ones((B_MICRO, 256, 256), jnp.float32)
    return run, x, K


def rollk():
    res = {}
    for kind in ("alu", "rolls", "ptpu_rolls"):
        def one(kind=kind):
            run, x, K = make_rollk(kind)
            best = timed(run, x)
            res[kind] = best
            log(item=f"rollk_{kind}", secs=round(best, 4),
                us_per_env_round=round(best / B_MICRO / K * 1e6, 3))
        guard(f"rollk_{kind}", one)
    if "alu" in res:
        for kind in ("rolls", "ptpu_rolls"):
            if kind in res:
                per_roll_ns = (res[kind] - res["alu"]) / B_MICRO / 64 / 8 * 1e9
                log(item=f"rollk_delta_{kind}",
                    ns_per_roll_traversal=round(per_roll_ns, 1))


# ---------------------------------------------- 6. banded large-field kernel
def banded():
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.pallas_step import pallas_banded_rollout_batch
    from die_tpu.fast.rollout import fast_rollout

    dyn = FastDynamics()
    for F, bands, B, T, K in ((512, 4, 32, 16, 1),
                              (512, 8, 32, 16, 2),
                              (512, 8, 32, 16, 4),
                              (1024, 16, 8, 16, 2),
                              (1024, 16, 8, 16, 4)):
        def one(F=F, bands=bands, B=B, T=T, K=K):
            keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(
                jnp.arange(B))
            states = jax.jit(jax.vmap(
                lambda k: fast_init_jax(k, (F, F), dyn)))(keys)
            rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(
                jnp.arange(B))

            @jax.jit
            def run(states, rkeys):
                _, rew, _ = pallas_banded_rollout_batch(
                    dyn, states, rkeys, T, num_bands=bands, num_inner=K)
                return jnp.sum(rew)

            best = timed(run, states, rkeys)
            log(item=f"banded_{F}x{F}_b{bands}_k{K}", secs=round(best, 4), B=B,
                T=T, env_steps_per_s=round(B * T / best, 1))



        guard(f"banded_{F}_k{K}", one)



if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(item="start", which=which)
    if which in ("all", "poll"):
        guard("poll", poll)
    if which in ("all", "micro"):
        micro_dtypes()
        micro_rolls()
    if which in ("all", "e2e"):
        e2e_variants()
    if which in ("all", "rollk"):
        rollk()
    if which in ("all", "banded"):
        banded()
    if which in ("all", "gather"):
        guard("mxu_gather", mxu_gather_bench)
    log(item="done", which=which)
