#!/usr/bin/env python
"""Round-5 measure-or-refute: MXU offload of the fast step's
dot-expressible pieces (VERDICT r4 weak #1 — the one formulation class
with no PERF.md entry).

The lattice step is roll/elementwise (VPU) by construction; the pieces
that CAN be phrased as matmuls are the circulant ones:
  1. chem diffusion — the separable Gaussian is out = A @ x @ B^T with
     A, B circulant banded (5 taps at sigma 0.5; 11 at the 16-dir 1.25);
  2. any torus roll — a permutation matrix is the degenerate circulant.

Items (offset-subtracted; B=64 vmapped blocks of 256^2, K reps in-kernel):
  diffuse_vpu      — the production separable stencil, in-kernel
  diffuse_mxu_f32  — A @ x @ Bt with f32 MXU dots, in-kernel
  diffuse_mxu_bf16 — same with bf16 inputs / f32 accumulation
  (each also as a plain-XLA jit for the compiler's own choice)
  roll_vpu / roll_mxu — K chained +1-row rolls vs permutation matmuls
  ulp check        — matmul vs stencil accumulation-order divergence
                     (an MXU form could NOT keep the bitwise contract)

Appends to tools/tpu_mxu_log.jsonl.  Run serially (one TPU process).
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

from die_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from die_tpu.core.mathx import set_pallas_trace
from die_tpu.ops.gaussian import gaussian_taps, separable_gaussian

LOG_PATH = "/root/repo/tools/tpu_mxu_log.jsonl"
F = 256
B = 64
K = 64


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG_PATH, "a") as f:
        f.write(json.dumps(kw) + "\n")


def sync(x):
    return float(np.asarray(x))


def timed(f, *a, reps=3):
    sync(f(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def null_offset():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    return timed(f, x, reps=5)


def guard(name, fn):
    try:
        fn()
    except Exception as e:
        log(item=name, error=str(e)[:500])
        traceback.print_exc()


def circulant(n, taps):
    r = (len(taps) - 1) // 2
    A = np.zeros((n, n), np.float32)
    for k, w in enumerate(taps):
        off = k - r
        for i in range(n):
            A[i, (i + off) % n] = w
    return A


def make_diffuse_kernel(kind, sigma):
    """K diffusion applications in one VMEM-resident kernel."""
    taps = gaussian_taps(sigma)
    A = jnp.asarray(circulant(F, taps))
    decay = np.float32(0.9)

    def kern(a_ref, x_ref, o_ref):
        prev = set_pallas_trace(True)
        try:
            def body(i, x):
                if kind == "vpu":
                    y = separable_gaussian(x, sigma)
                elif kind == "mxu_f32":
                    y = jnp.dot(a_ref[:], x,
                                preferred_element_type=jnp.float32)
                    y = jnp.dot(y, a_ref[:].T,
                                preferred_element_type=jnp.float32)
                else:  # mxu_bf16
                    ab = a_ref[:].astype(jnp.bfloat16)
                    y = jnp.dot(ab, x.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                    y = jnp.dot(y.astype(jnp.bfloat16), ab.T,
                                preferred_element_type=jnp.float32)
                return y * decay

            o_ref[:] = jax.lax.fori_loop(0, K, body, x_ref[:])
        finally:
            set_pallas_trace(prev)

    @jax.jit
    def run(x):
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((F, F), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = jax.vmap(lambda xb: call(A, xb))(x)
        return jnp.sum(y[:, 0, :64])

    x = jr.uniform(jr.PRNGKey(0), (B, F, F), jnp.float32)
    return run, x


def make_diffuse_xla(kind, sigma):
    taps = gaussian_taps(sigma)
    A = jnp.asarray(circulant(F, taps))
    decay = np.float32(0.9)

    @jax.jit
    def run(x):
        def body(i, x):
            if kind == "vpu":
                y = jax.vmap(lambda xb: separable_gaussian(xb, sigma))(x)
            else:
                y = jnp.einsum("im,bmj->bij", A, x,
                               preferred_element_type=jnp.float32)
                y = jnp.einsum("bim,jm->bij", y, A,
                               preferred_element_type=jnp.float32)
            return y * decay

        y = jax.lax.fori_loop(0, K, body, x)
        return jnp.sum(y[:, 0, :64])

    x = jr.uniform(jr.PRNGKey(0), (B, F, F), jnp.float32)
    return run, x


def make_roll_kernel(kind):
    P = jnp.asarray(np.roll(np.eye(F, dtype=np.float32), -1, axis=1))

    def kern(p_ref, x_ref, o_ref):
        def body(i, x):
            if kind == "vpu":
                y = pltpu.roll(x, 1, 0)
            else:
                y = jnp.dot(p_ref[:], x,
                            preferred_element_type=jnp.float32)
            return y + np.float32(1.0)

        o_ref[:] = jax.lax.fori_loop(0, K * 4, body, x_ref[:])

    @jax.jit
    def run(x):
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((F, F), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = jax.vmap(lambda xb: call(P, xb))(x)
        return jnp.sum(y[:, 0, :64])

    x = jr.uniform(jr.PRNGKey(0), (B, F, F), jnp.float32)
    return run, x


def ulp_check(sigma):
    """Max |ulp| divergence of one matmul application vs the separable
    stencil — the reason an MXU form cannot keep the bitwise contract."""
    taps = gaussian_taps(sigma)
    A = jnp.asarray(circulant(F, taps))
    x = jr.uniform(jr.PRNGKey(1), (F, F), jnp.float32)

    @jax.jit
    def both(x):
        a = separable_gaussian(x, sigma)
        b = jnp.dot(jnp.dot(A, x, preferred_element_type=jnp.float32),
                    A.T, preferred_element_type=jnp.float32)
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)
        bi = jax.lax.bitcast_convert_type(b, jnp.int32)
        return jnp.max(jnp.abs(ai - bi)), jnp.max(jnp.abs(a - b))

    u, d = both(x)
    log(item=f"ulp_sigma{sigma}", max_ulp=int(np.asarray(u)),
        max_abs=float(np.asarray(d)))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(item="start", which=which, backend=jax.devices()[0].platform)
    OFF = null_offset()
    log(item="null_offset", ms=round(OFF * 1e3, 2))

    apps = B * K
    if which in ("all", "diffuse"):
        for sigma in (0.5, 1.25):
            for kind in ("vpu", "mxu_f32", "mxu_bf16"):
                def one(kind=kind, sigma=sigma):
                    run, x = make_diffuse_kernel(kind, sigma)
                    best = timed(run, x) - OFF
                    log(item=f"diffuse_kernel_{kind}_s{sigma}",
                        secs=round(best, 4),
                        us_per_app=round(best / apps * 1e6, 3))

                guard(f"diffuse_kernel_{kind}_s{sigma}", one)
            for kind in ("vpu", "mxu"):
                def one(kind=kind, sigma=sigma):
                    run, x = make_diffuse_xla(kind, sigma)
                    best = timed(run, x) - OFF
                    log(item=f"diffuse_xla_{kind}_s{sigma}",
                        secs=round(best, 4),
                        us_per_app=round(best / apps * 1e6, 3))

                guard(f"diffuse_xla_{kind}_s{sigma}", one)
    if which in ("all", "roll"):
        for kind in ("vpu", "mxu"):
            def one(kind=kind):
                run, x = make_roll_kernel(kind)
                best = timed(run, x) - OFF
                log(item=f"roll_kernel_{kind}", secs=round(best, 4),
                    ns_per_roll=round(best / (B * K * 4) * 1e9, 2))

            guard(f"roll_kernel_{kind}", one)
    if which in ("all", "ulp"):
        guard("ulp", lambda: ulp_check(0.5))
    log(item="done", which=which)
