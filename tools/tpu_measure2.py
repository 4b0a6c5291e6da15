#!/usr/bin/env python
"""Round-2 TPU measurements: Pallas gather candidates for the exact engine,
bit-plane packing primitive costs (pilot before committing to the packed
kernel rewrite), and the 4-direction headline option at full batch.

Appends JSON lines to tools/tpu_measure_log.jsonl (same file as round 1).
Run items selectively:  python tools/tpu_measure2.py gather|packed|dir4|all
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
    return float(np.asarray(jax.tree.leaves(x)[0].sum()
                            if hasattr(x, "sum") is False else x.sum()))


def timed(f, *a, reps=3):
    r = f(*a)
    float(np.asarray(jnp.sum(r if isinstance(r, jax.Array) else r[0])))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        float(np.asarray(jnp.sum(r if isinstance(r, jax.Array) else r[0])))
        best = min(best, time.perf_counter() - t0)
    return best


def guard(name, fn):
    t0 = time.time()
    try:
        fn()
    except Exception as e:
        log(item=name, error=str(e)[:500], wall=round(time.time() - t0, 1))
        traceback.print_exc()


# ------------------------------------------------------- 1. gather variants
W = H = 256
N = 65536
GATHER_REPS = 16  # inner repetitions per kernel to amortize launch
GATHER_VARIANTS = "taa,onehot"  # overridden by CLI: gather:onehot etc.


def gather_taa_fullshape(field, idx_full):
    """Native lane gather with the Mosaic constraint idx.shape == a.shape:
    operand [8, WH] (field broadcast to 8 sublanes), idx [8, WH] with the
    real N indices in the leading lanes; out sliced to [8, N/8]."""
    R = 8

    def kern(f_ref, i_ref, o_ref):
        fb = pltpu.repeat(f_ref[:].reshape(1, W * H), R, axis=0)

        def body(k, acc):
            g = jnp.take_along_axis(fb, i_ref[:] + k - k, axis=1)
            return acc + g[:, :N // R]

        o_ref[:] = jax.lax.fori_loop(0, GATHER_REPS, body,
                                     jnp.zeros((R, N // R), jnp.float32))

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, N // R), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(field, idx_full)


def make_gather_onehot_kernel(chunk, rows, cols, precision):
    """In-kernel MXU one-hot two-stage (the ops/mxu_gather.py formulation
    with all intermediates VMEM-resident): onehot rows @ field[rows, cols]
    on the MXU, one-hot column pick on the VPU.

    precision='3x' splits the field into an exact bf16 hi/mid/lo triple and
    runs three DEFAULT (single-pass bf16) dots: the one-hot operand is exact
    in bf16 and the parts are bf16-representable, so each dot is exact and
    hi+mid+lo reconstructs the f32 value bit-exactly at half the MXU passes
    of HIGHEST (6-pass)."""
    n_chunks = N // chunk

    def kern(f_ref, r_ref, c_ref, o_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, cols), 1)
        if precision == "3x":
            f = f_ref[:]
            hi = jax.lax.convert_element_type(
                jax.lax.convert_element_type(f, jnp.bfloat16), jnp.float32)
            mid = jax.lax.convert_element_type(
                jax.lax.convert_element_type(f - hi, jnp.bfloat16),
                jnp.float32)
            lo = f - hi - mid

        def body(k, acc):
            rc = r_ref[0] + k - k  # (chunk, 1)
            cc = c_ref[0]
            onehot_r = (row_iota == rc).astype(jnp.float32)
            if precision == "3x":
                picked = (jax.lax.dot(onehot_r, hi)
                          + jax.lax.dot(onehot_r, mid)
                          + jax.lax.dot(onehot_r, lo))
            else:
                picked = jax.lax.dot(onehot_r, f_ref[:],
                                     precision=precision)
            onehot_c = (col_iota == cc).astype(jnp.float32)
            return acc + jnp.sum(picked * onehot_c, axis=1, keepdims=True)

        o_ref[0] = jax.lax.fori_loop(0, GATHER_REPS, body,
                                     jnp.zeros((chunk, 1), jnp.float32))

    spec = pl.BlockSpec((1, chunk, 1), lambda c: (c, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        out_shape=jax.ShapeDtypeStruct((n_chunks, chunk, 1), jnp.float32),
        in_specs=[pl.BlockSpec((rows, cols), lambda c: (0, 0),
                               memory_space=pltpu.VMEM), spec, spec],
        out_specs=spec,
    )


def gather_bench():
    key = jr.PRNGKey(0)
    field = jr.uniform(key, (W, H), jnp.float32)
    cell = jr.randint(jr.fold_in(key, 1), (N,), 0, W * H, jnp.int32)
    ref = np.asarray(field).reshape(-1)[np.asarray(cell)]

    # baseline: jnp.take in plain XLA, same rep count
    @jax.jit
    def take_flat(f, c):
        flat = f.reshape(-1)

        def body(k, acc):
            return acc + jnp.take(flat, c + k - k)

        return jax.lax.fori_loop(0, GATHER_REPS, body,
                                 jnp.zeros((N,), jnp.float32))

    b = timed(take_flat, field, cell) / GATHER_REPS
    log(item="g2_take", ns_per_elem=round(b / N * 1e9, 3))

    if "taa" in GATHER_VARIANTS:
        idx_full = jnp.zeros((8, W * H), jnp.int32).at[:, :N // 8].set(
            cell.reshape(8, N // 8))
        run = jax.jit(gather_taa_fullshape)
        out = run(field, idx_full)
        ok = bool(np.allclose(np.asarray(out).reshape(-1),
                              ref.reshape(8, -1).reshape(-1) * GATHER_REPS,
                              rtol=1e-6))
        b = timed(run, field, idx_full) / GATHER_REPS
        log(item="g2_pallas_taa_fullshape",
            ns_per_elem=round(b / N * 1e9, 3), exact=ok)
    if "onehot" not in GATHER_VARIANTS:
        return

    chunk = 1024
    rows, cols = 512, 128  # flat field reshaped to lane width
    field_rc = field.reshape(rows, cols)
    r2 = (cell // cols).reshape(N // chunk, chunk, 1)
    c2 = (cell % cols).reshape(N // chunk, chunk, 1)
    for prec, tag in ((jax.lax.Precision.HIGHEST, "highest"), ("3x", "3x")):
        run2 = jax.jit(make_gather_onehot_kernel(chunk, rows, cols, prec))
        out2 = run2(field_rc, r2, c2)
        ok2 = bool(np.allclose(np.asarray(out2).reshape(-1),
                               ref * GATHER_REPS, rtol=1e-6))
        b = timed(run2, field_rc, r2, c2) / GATHER_REPS
        log(item=f"g2_pallas_onehot_{tag}",
            ns_per_elem=round(b / N * 1e9, 3), exact=ok2)


# ------------------------------------------- 2. bit-plane primitive pilots
def packed_bench():
    """Costs of the packed-domain building blocks at 256x256:
    - chain of dependent bit-ops on packed u32[8,256] vs full u32[256,256]
    - pack (full bool -> bitboard) and unpack (bitboard -> full bool)
    - funnel roll of a bitboard along the packed axis
    """
    CHAIN = 256

    def chain_kernel(shape):
        def kern(x_ref, o_ref):
            def body(k, x):
                x = x ^ (x << np.uint32(1))
                x = x | (x >> np.uint32(3))
                x = x + np.uint32(0x9E3779B9)
                x = x & (x ^ np.uint32(0x85EBCA6B))
                return x

            o_ref[:] = jax.lax.fori_loop(0, CHAIN, body, x_ref[:])

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    for shape, tag in (((8, 256), "packed"), ((256, 256), "full"),
                       ((64, 256), "packed_x8envs")):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 2**32, shape,
                                              dtype=np.uint32))
        run = jax.jit(chain_kernel(shape))
        b = timed(run, x) / CHAIN / 4  # 4 chained ops per iter
        log(item=f"pk_chain_{tag}", shape=list(shape),
            ns_per_op_per_word=round(b / (shape[0] * shape[1]) * 1e9, 4),
            ns_per_op_per_cell256=round(b / (256 * 256) * 1e9, 4))

    # pack: full 0/1 i32 [256,256] -> u32 [8,256]
    PACKREPS = 65  # odd: xor-accumulation leaves one copy, so exactness is real

    def pack_kernel():
        def kern(x_ref, o_ref):
            rowpos = jax.lax.broadcasted_iota(jnp.uint32, (256, 256), 0)
            shamt = rowpos & np.uint32(31)

            def body(k, acc):
                x = (x_ref[:] + k - k) << shamt
                for s in (1, 2, 4, 8, 16):
                    x = x | pltpu.roll(x, 256 - s, 0)
                words = jnp.concatenate(
                    [x[32 * j:32 * j + 1] for j in range(8)], axis=0)
                return acc ^ words

            o_ref[:] = jax.lax.fori_loop(0, PACKREPS, body,
                                         jnp.zeros((8, 256), jnp.uint32))

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    bits = jnp.asarray(np.random.default_rng(1).integers(
        0, 2, (256, 256), dtype=np.uint32))
    run = jax.jit(pack_kernel())
    out = np.asarray(run(bits))
    # verify against numpy pack (xor of PACKREPS identical packs ->
    # PACKREPS odd/even)
    bn = np.asarray(bits)
    words = np.zeros((8, 256), np.uint32)
    for w in range(256):
        words[w // 32] |= bn[w].astype(np.uint32) << np.uint32(w % 32)
    expect = words * np.uint32(0) if PACKREPS % 2 == 0 else words
    ok = bool(np.array_equal(out, expect))
    b = timed(run, bits) / PACKREPS
    log(item="pk_pack_cost", us=round(b * 1e6, 3), exact=ok,
        equiv_full_passes=round(b / 0.00000655, 2))  # vs ~6.55us/full pass?

    # unpack: u32 [8,256] -> full 0/1 u32 [256,256] via repeat+shift+and
    def unpack_kernel():
        def kern(x_ref, o_ref):
            rowpos = jax.lax.broadcasted_iota(jnp.uint32, (256, 256), 0)
            shamt = rowpos & np.uint32(31)

            def body(k, acc):
                xb = pltpu.repeat(x_ref[:] + k - k, 32, axis=0)
                return acc ^ ((xb >> shamt) & np.uint32(1))

            o_ref[:] = jax.lax.fori_loop(0, PACKREPS, body,
                                         jnp.zeros((256, 256), jnp.uint32))

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    packed = jnp.asarray(words)
    run = jax.jit(unpack_kernel())
    out = np.asarray(run(packed))
    expect = (np.repeat(np.asarray(packed), 32, axis=0)
              >> (np.arange(256, dtype=np.uint32)[:, None]
                  & np.uint32(31))) & 1 if PACKREPS % 2 else bn * 0
    ok = bool(np.array_equal(out, expect if PACKREPS % 2 else out * 0))
    b = timed(run, packed) / PACKREPS
    log(item="pk_unpack_cost", us=round(b * 1e6, 3), exact=ok)

    # funnel roll on packed board (roll one cell along the packed axis)
    FREPS = 512

    def funnel_kernel():
        def kern(x_ref, o_ref):
            def body(k, x):
                up = pltpu.roll(x, 1, 0)
                return (x << np.uint32(1)) | (up >> np.uint32(31))

            o_ref[:] = jax.lax.fori_loop(0, FREPS, body, x_ref[:])

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )

    run = jax.jit(funnel_kernel())
    b = timed(run, packed) / FREPS
    log(item="pk_funnel_roll", ns=round(b * 1e9, 1))


# ------------------------------------------------- 3. 4-dir headline option
def dir4_bench():
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.rollout import fast_rollout_auto

    for nd, B, T in ((4, 1024, 256), (8, 1024, 256)):
        dyn = FastDynamics(num_dirs=nd)
        keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(
            jnp.arange(B))
        states = jax.jit(jax.vmap(
            lambda k: fast_init_jax(k, (256, 256), dyn)))(keys)
        rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(
            jnp.arange(B))

        @jax.jit
        def run(states, rkeys, dyn=dyn, T=T):
            _, rew, _ = jax.vmap(lambda s, k: fast_rollout_auto(
                dyn, s, k, T, num_inner=T))(states, rkeys)
            return jnp.sum(rew)

        b = timed(run, states, rkeys)
        log(item=f"dir{nd}_B{B}_K{T}",
            env_steps_per_s=round(B * T / b, 1))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(item="start2", which=which)
    if which.startswith("gather") or which == "all":
        if ":" in which:
            GATHER_VARIANTS = which.split(":", 1)[1]
        guard("g2", gather_bench)
    if which in ("all", "packed"):
        guard("pk", packed_bench)
    if which in ("all", "dir4"):
        guard("dir4", dir4_bench)
    log(item="done2", which=which)
