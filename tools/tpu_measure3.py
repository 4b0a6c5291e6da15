#!/usr/bin/env python
"""Round-2b TPU measurements: exact-engine deposit-sort and gather levers.

1. sort  — deposit-scatter sort variants at the headline exact config
           (64 envs x 65536 slots):
             stable2   current formulation: stable (i32 cell, f32 dep)
                       num_keys=1 (XLA adds an iota tiebreaker for
                       stability -> effectively 3 permuted operands)
             unique2   proposed: unstable (u32 cell<<16|slot, f32 dep) —
                       winner-take-last rides in the slot bits, keys unique
             key1      single-operand u32 sort (lower bound, no payload)
2. int8  — MXU dot rates at the one-hot gather shape: bf16 (DEFAULT) vs
           s8xs8->s32 (v5e lists 2x int8 peak); decides whether the
           byte-plane gather (ops/mxu_gather.py) should ride int8 dots.

Appends JSON lines to tools/tpu_measure_log.jsonl.
Run: python tools/tpu_measure3.py sort|int8|all
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

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
    float(np.asarray(jnp.sum(jax.tree.leaves(r)[0])))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        float(np.asarray(jnp.sum(jax.tree.leaves(r)[0])))
        best = min(best, time.perf_counter() - t0)
    return best


def guard(name, fn):
    t0 = time.time()
    try:
        fn()
    except Exception as e:
        log(item=name, error=str(e)[:500], wall=round(time.time() - t0, 1))
        traceback.print_exc()


B, N, HW = 64, 65536, 65536
REPS_IN = 8  # inner repetitions inside the jit to amortize the tunnel call


def sort_bench():
    key = jr.PRNGKey(0)
    cell = jr.randint(key, (B, N), 0, HW, jnp.int32)
    alive = jr.uniform(jr.fold_in(key, 1), (B, N)) < 0.15
    dep = jr.uniform(jr.fold_in(key, 2), (B, N), jnp.float32)
    cell_masked = jnp.where(alive, cell, HW).astype(jnp.int32)
    slot = jnp.arange(N, dtype=jnp.uint32)
    ukey = jnp.where(alive,
                     (cell.astype(jnp.uint32) << jnp.uint32(16)) | slot,
                     jnp.uint32(0xFFFF0000) | slot)

    def rep(fn):
        def run(*args):
            def body(k, acc):
                outs = fn(*[a if a.dtype != jnp.float32 else a + k - k
                            for a in args])
                return acc + jnp.sum(outs[-1][..., :8])

            return jax.lax.fori_loop(0, REPS_IN, body, jnp.float32(0.0))

        return jax.jit(run)

    f = rep(lambda c, d: jax.lax.sort((c, d), num_keys=1, is_stable=True))
    b = timed(f, cell_masked, dep) / REPS_IN
    log(item="s3_stable2", ns_per_elem=round(b / (B * N) * 1e9, 2))

    f = rep(lambda c, d: jax.lax.sort((c, d), num_keys=1, is_stable=False))
    b = timed(f, ukey, dep) / REPS_IN
    log(item="s3_unique2_unstable", ns_per_elem=round(b / (B * N) * 1e9, 2))

    f = rep(lambda c, d: (jax.lax.sort(c, dimension=-1, is_stable=False),
                          d))
    # key-only lower bound: payload untouched (sum over dep keeps data live)
    def key1(c, d):
        s = jax.lax.sort(c, dimension=-1, is_stable=False)
        return (s, s.astype(jnp.float32) * 0 + d)

    f = rep(key1)
    b = timed(f, ukey, dep) / REPS_IN
    log(item="s3_key1", ns_per_elem=round(b / (B * N) * 1e9, 2))


def _offset():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    return timed(f, x, reps=5)


def int8_bench():
    """bf16 vs s8xs8->s32 MXU dot rate at the byte-plane gather/scatter
    shape.  Inputs are rolled every iteration so XLA cannot hoist the dot
    out of the loop (the first run of this item measured only the ~24 ms
    tunnel constant); the null offset is subtracted."""
    chunk, rows, cols = 2048, 512, 512
    key = jr.PRNGKey(3)
    a_f = (jr.uniform(key, (chunk, rows)) < 0.002).astype(jnp.float32)
    b_f = jnp.floor(jr.uniform(jr.fold_in(key, 1), (rows, cols),
                               jnp.float32) * 255)
    a_i = a_f.astype(jnp.int8)
    b_i = (b_f - 128).astype(jnp.int8)
    ITERS = 512
    off = _offset()
    log(item="i8b_offset_ms", v=round(off * 1e3, 1))

    def rep(fn, cast):
        def run(x, y):
            def body(k, carry):
                x, acc = carry
                out = fn(x, y)
                return (jnp.roll(x, 1, axis=0),
                        acc + out[0, 0].astype(jnp.float32))

            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
            return acc

        return jax.jit(run)

    macs = chunk * rows * cols
    f = rep(lambda x, y: jax.lax.dot(x, y), jnp.float32)
    b = (timed(f, a_f, b_f) - off) / ITERS
    log(item="i8b_dot_bf16_default", tmacs_per_s=round(macs / b / 1e12, 2),
        us=round(b * 1e6, 2))

    def dot_i8(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    f = rep(dot_i8, jnp.int32)
    b = (timed(f, a_i, b_i) - off) / ITERS
    log(item="i8b_dot_s8s8_s32", tmacs_per_s=round(macs / b / 1e12, 2),
        us=round(b * 1e6, 2))


def scatter_bench():
    """The deposit substep's two at[].set scatters vs the MXU one-hot
    scatter (ops/mxu_scatter.py), offset-subtracted, inputs rolled."""
    from die_tpu.ops.mxu_scatter import onehot_scatter_winner

    n, hw = N, HW
    key = jr.PRNGKey(7)
    # per-env PERMUTATION prefix (as tests/test_mxu_scatter.py): masked rows
    # must hit distinct cells or the MXU variant's byte-plane accumulation
    # (and its checksum) is not comparable to the at[].set variant
    # (round-2 advisor finding)
    cells = jax.vmap(lambda k: jr.permutation(k, hw)[:n].astype(jnp.int32))(
        jr.split(key, B))
    vals = jr.uniform(jr.fold_in(key, 1), (B, n), jnp.float32)
    mask = jr.uniform(jr.fold_in(key, 2), (B, n)) < 0.1
    slot = jnp.arange(n, dtype=jnp.int32)
    ITERS = 16
    off = _offset()

    def rep(fn):
        def run(c, v, m):
            def body(k, carry):
                c, acc = carry
                out = fn(c, v, m)
                return (jnp.roll(c, 1, axis=-1), acc + jnp.sum(out[..., :8]))

            _, acc = jax.lax.fori_loop(0, ITERS, body, (c, jnp.float32(0.0)))
            return acc

        return jax.jit(run)

    def set_scatter(c, v, m):
        def one(c, v, m):
            target = jnp.where(m, c, hw + slot)
            dep = jnp.zeros((hw + n,), jnp.float32).at[target].set(
                v, mode="drop", unique_indices=True)
            occ = jnp.zeros((hw + n,), jnp.float32).at[target].set(
                jnp.ones((n,), jnp.float32), mode="drop",
                unique_indices=True)
            return dep[:hw] + occ[:hw]

        return jax.vmap(one)(c, v, m)

    b = (timed(rep(set_scatter), cells, vals, mask) - off) / ITERS
    log(item="sc_at_set", ms_per_batch=round(b * 1e3, 2),
        ns_per_elem=round(b / (B * n) * 1e9, 2))

    def mxu_scatter(c, v, m):
        def one(c, v, m):
            dense, count = onehot_scatter_winner(v, c, m, hw)
            return dense + count

        return jax.vmap(one)(c, v, m)

    b = (timed(rep(mxu_scatter), cells, vals, mask) - off) / ITERS
    log(item="sc_mxu", ms_per_batch=round(b * 1e3, 2),
        ns_per_elem=round(b / (B * n) * 1e9, 2))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(item="start3", which=which, backend=jax.default_backend())
    if which in ("all", "sort"):
        guard("s3", sort_bench)
    if which in ("all", "int8"):
        guard("i8", int8_bench)
    if which in ("all", "scatter"):
        guard("sc", scatter_bench)
    log(item="done3", which=which)
