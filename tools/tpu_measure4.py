"""Round-3 gather-dot shape experiments (VERDICT item 4).

The policy profile (tools/prof_policy.py) shows the exact-engine step is
~69 of 77.9 ms pure one-hot byte-plane dots running at ~83 T MACs/s
effective — 43% of the measured 191 T bf16 peak.  The dots are small
([chunk=2048, rows=512] @ [rows, 128] per plane per env under vmap).
This tool A/Bs shapes that keep the MAC count identical but change dot
geometry:

  * row_width in {128, 256, 512}: wider field rows mean a smaller one-hot
    contraction (K = HW/row_width) and a wider output (N = row_width);
  * column-concat of the gx/gy PAIR: one dot per plane over a [rows, 256]
    two-field plane, halving dot count at 2x N (the round-2b wide-concat
    failure glued 4096 columns; 256 should stay fusable);
  * chunk in {2048, 4096} at the winning width.

Timing: offset-subtracted, scalar-synced, T-iteration scan with
index rolls so nothing hoists.  One JSONL line per variant.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from die_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import jax.random as jr

B, HW, N, T = 64, 65536, 65536, 16


def timed(f, *a, reps=3):
    r = f(*a)
    float(np.asarray(r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        float(np.asarray(r))
        best = min(best, time.perf_counter() - t0)
    return best


x = jnp.ones((8, 128), jnp.float32)
off = timed(jax.jit(lambda x: jnp.sum(x + 1.0)), x, reps=5)
print(json.dumps({"item": "off_ms", "v": round(off * 1e3, 1)}), flush=True)

key = jr.PRNGKey(0)
fields = jr.uniform(key, (B, 2, HW), jnp.float32)
idx0 = jr.randint(jr.fold_in(key, 1), (B, N), 0, HW, jnp.int32)


def make_variant(row_width, chunk, concat_pair):
    from die_tpu.ops.mxu_gather import onehot_gather_multi

    def one_env(pair, idx):
        if not concat_pair:
            gx, gy = onehot_gather_multi((pair[0], pair[1]), idx,
                                         row_width=row_width, chunk=chunk)
            return jnp.sum(gx) + jnp.sum(gy)
        # column-concat: gather both fields through one dot per plane
        from die_tpu.ops.mxu_gather import _byte_planes

        rows = HW // row_width
        f2 = jnp.concatenate([pair[0].reshape(rows, row_width),
                              pair[1].reshape(rows, row_width)], axis=1)
        planes = _byte_planes(f2)
        r = (idx // row_width).astype(jnp.int32).reshape(-1, chunk)
        c = (idx % row_width).astype(jnp.int32).reshape(-1, chunk)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32,
                                            (chunk, row_width), 1)

        def one_chunk(args):
            rc, cc = args
            onehot_r = (row_iota == rc[:, None]).astype(jnp.bfloat16)
            onehot_c = (col_iota == cc[:, None]).astype(jnp.float32)
            accx = accy = None
            for k, p in enumerate(planes):
                picked = jax.lax.dot(onehot_r, p,
                                     preferred_element_type=jnp.float32)
                bx = jnp.sum(picked[:, :row_width] * onehot_c, axis=1)
                by = jnp.sum(picked[:, row_width:] * onehot_c, axis=1)
                dx = bx.astype(jnp.uint32) << np.uint32(8 * k)
                dy = by.astype(jnp.uint32) << np.uint32(8 * k)
                accx = dx if accx is None else accx | dx
                accy = dy if accy is None else accy | dy
            return (jax.lax.bitcast_convert_type(accx, jnp.float32),
                    jax.lax.bitcast_convert_type(accy, jnp.float32))

        gx, gy = jax.lax.map(one_chunk, (r, c))
        return jnp.sum(gx) + jnp.sum(gy)

    def run(fields, idx):
        def body(carry, t):
            # roll indices so the gather cannot hoist out of the scan
            ix = (idx + t) % HW
            out = jax.vmap(one_env)(fields, ix)
            return carry + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(T))
        return acc

    return jax.jit(run)


def report(tag, row_width, chunk, concat):
    b = (timed(make_variant(row_width, chunk, concat), fields, idx0)
         - off) / T
    macs = 2 * 4 * B * N * HW  # 2 fields x 4 planes
    print(json.dumps({"item": tag, "ms_per_batch_gatherpair":
                      round(b * 1e3, 2),
                      "tmacs_per_s": round(macs / b / 1e12, 1)}),
          flush=True)


report("pair_w128_c2048", 128, 2048, False)   # current production shape
report("pair_w256_c2048", 256, 2048, False)
report("pair_w512_c2048", 512, 2048, False)
report("pair_w256_c4096", 256, 4096, False)
report("pair_concat_w128_c2048", 128, 2048, True)
report("pair_concat_w256_c2048", 256, 2048, True)
