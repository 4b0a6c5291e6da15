"""MXU one-hot scatter: unique-winner placement as matmul, bitwise-exact.

XLA:TPU lowers ``at[idx].set`` with computed indices to a slow scatter even
with ``unique_indices=True`` (measured ~45 ms of the exact engine's 51.9 ms
deposit substep at 64 envs x 65536 slots — docs/PERF.md round-2b).  This
formulation places each winner's value with matmuls instead:

    out[cell] = sum_i onehot_r[i, row(cell)] * onehot_c[i, col(cell)] * v[i]

computed as a contraction over agents:  ``onehot_r^T @ (onehot_c * v)`` —
an MXU dot per byte plane.  Masked (non-winner) entries carry value +0.0,
whose byte planes are all zero, so they contribute exactly nothing to any
cell; the caller guarantees at most one unmasked entry per cell, so every
accumulation is "one byte plus zeros" — exact in a DEFAULT (single-pass
bf16) dot, and the reconstructed u32 is the winner's exact f32 bit pattern
(including -0.0 and subnormals — see ops/mxu_gather.py::_byte_planes).

The count pass (values identically 1.0) rides the same one-hots and yields
exact 0.0/1.0 floats — the occupancy layout.

Replaces the duplicate-drop scatter semantics of the reference's buffered
fancy-index ``+=`` (reference core/env.py:211-215) on the TPU hot path;
bit-equality vs the ``at[].set`` formulation is asserted in
tests/test_mxu_scatter.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from die_tpu.ops.mxu_gather import _byte_planes, mxu_gather_enabled


def mxu_scatter_enabled() -> bool:
    """The scatter shares the gather's routing switch (TPU-only by
    default; ``use_mxu_gather`` forces both)."""
    return mxu_gather_enabled()


def onehot_scatter_winner(values, cells, mask, hw: int,
                          row_width: int = 128, chunk: int = 4096):
    """Dense placement of masked winners: returns ``(dense, count)``.

    ``values``: f32[N]; ``cells``: i32[N] (any value for masked-out rows —
    rows with ``mask`` False contribute nothing, and out-of-range cells
    fall outside every one-hot); ``mask``: bool[N], at most one True row
    per cell.  ``dense``: f32[hw] with the winner's exact bit pattern at
    its cell, +0.0 elsewhere.  ``count``: f32[hw], exactly 1.0 at winner
    cells, 0.0 elsewhere.
    """
    assert hw % row_width == 0
    rows = hw // row_width
    n = values.shape[0]
    pad = (-n) % chunk
    maskf = mask.astype(jnp.float32)
    vals = jnp.where(mask, values, np.float32(0.0))
    # masked rows point at row 'rows' (outside every one-hot)
    r = jnp.where(mask, cells // row_width, rows).astype(jnp.int32)
    c = (cells % row_width).astype(jnp.int32)
    if pad:
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
        maskf = jnp.concatenate([maskf, jnp.zeros((pad,), maskf.dtype)])
        r = jnp.concatenate([r, jnp.full((pad,), rows, r.dtype)])
        c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
    n_chunks = vals.shape[0] // chunk
    vals = vals.reshape(n_chunks, chunk)
    maskf = maskf.reshape(n_chunks, chunk)
    r = r.reshape(n_chunks, chunk)
    c = c.reshape(n_chunks, chunk)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, row_width), 1)

    def body(carry, args):
        planes_acc, count_acc = carry
        vc, mc, rc, cc = args
        # bf16 one-hots/planes: the single-pass bf16 dot with f32
        # accumulation is exact for 0/1 x [0,255] values (a wide dot over
        # concatenated column blocks measured SLOWER — the concat
        # materializes; keep narrow per-plane dots that fuse)
        onehot_r = (row_iota == rc[:, None]).astype(jnp.bfloat16)
        onehot_c = (col_iota == cc[:, None]).astype(jnp.bfloat16)
        vplanes = _byte_planes(vc)  # 4 x bf16[chunk], integers 0..255
        new_planes = []
        for k in range(4):
            colvals = onehot_c * vplanes[k][:, None]
            d = jax.lax.dot_general(onehot_r, colvals,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            new_planes.append(planes_acc[k] + d)
        colcnt = onehot_c * mc[:, None].astype(jnp.bfloat16)
        dcnt = jax.lax.dot_general(onehot_r, colcnt,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return (tuple(new_planes), count_acc + dcnt), None

    zeros = jnp.zeros((rows, row_width), jnp.float32)
    (planes, count), _ = jax.lax.scan(
        body, ((zeros,) * 4, zeros), (vals, maskf, r, c))

    acc = None
    for k in range(4):
        d = planes[k].astype(jnp.uint32) << np.uint32(8 * k)
        acc = d if acc is None else acc | d
    dense = jax.lax.bitcast_convert_type(acc, jnp.float32)
    return dense.reshape(-1), count.reshape(-1)


def onehot_scatter_add_smallint(values, cells, mask, hw: int,
                                row_width: int = 128, chunk: int = 4096):
    """ACCUMULATING one-hot scatter-add for values exactly representable in
    bf16 whose per-cell sums stay below 2^24: ``out[c] = sum_{i: cells[i]=c}
    values[i]`` as a single bf16 dot per chunk with f32 accumulation —
    duplicates genuinely add (unlike :func:`onehot_scatter_winner`, whose
    byte planes only support at-most-one-winner placement).  Exact because
    every product is 0 or an exactly-representable value and the f32
    accumulator never rounds below 2^24.  Used by the sparse lattice
    engine's conflict resolution (distinct powers of two per cell)."""
    assert hw % row_width == 0
    rows = hw // row_width
    n = values.shape[0]
    pad = (-n) % chunk
    vals = jnp.where(mask, values, np.float32(0.0))
    r = jnp.where(mask, cells // row_width, rows).astype(jnp.int32)
    c = (cells % row_width).astype(jnp.int32)
    if pad:
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
        r = jnp.concatenate([r, jnp.full((pad,), rows, r.dtype)])
        c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
    n_chunks = vals.shape[0] // chunk
    vals = vals.reshape(n_chunks, chunk)
    r = r.reshape(n_chunks, chunk)
    c = c.reshape(n_chunks, chunk)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, row_width), 1)

    def body(acc, args):
        vc, rc, cc = args
        onehot_r = (row_iota == rc[:, None]).astype(jnp.bfloat16)
        onehot_c = (col_iota == cc[:, None]).astype(jnp.bfloat16)
        colvals = onehot_c * vc.astype(jnp.bfloat16)[:, None]
        d = jax.lax.dot_general(onehot_r, colvals,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + d, None

    zeros = jnp.zeros((rows, row_width), jnp.float32)
    acc, _ = jax.lax.scan(body, zeros, (vals, r, c))
    return acc.reshape(-1)
