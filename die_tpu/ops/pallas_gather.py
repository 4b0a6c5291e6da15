"""Pallas fused one-hot gather: the byte-plane MXU gather with the picked
intermediate kept in VMEM.

The XLA-level formulation (ops/mxu_gather.py) measures ~83-89 T effective
MACs/s; this kernel fuses dot + one-hot column pick per plane so no
intermediate leaves VMEM — the only HBM traffic is the planes in and the
gathered values out.

Layout: everything inside the kernel stays [*, chunk]-oriented — the
one-hots are built TRANSPOSED ([rows, chunk] / [width, chunk]) from
broadcasted iotas compared against a [1, chunk] index row, the dot
contracts the shared sublane (rows) dimension, and the column pick is a
sublane reduction to [1, chunk] — no 1-D arrays, no transposes, no
dynamic indexing (the Mosaic-lowerable op set, per CLAUDE.md).  Index
blocks arrive as [1, 8, chunk] (the TPU block-shape rule needs the last
two dims divisible by (8, 128)); the kernel loops the 8 sub-rows.

Exactness: identical argument to ops/mxu_gather.py — bf16 one-hots are
exact 0/1, byte planes are integers <= 255 (exact in bf16), every
accumulation is one byte plus zeros, and the reconstructed u32 is the
original f32 bit pattern (-0.0/subnormals/NaN included).  Bit-equality vs
jnp.take asserted in tests/test_pallas_gather.py (interpret mode).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from die_tpu.ops.mxu_gather import _byte_planes

_SUB = 8  # sub-rows per block (the TPU sublane block-shape quantum)

_USE_PALLAS = None  # None/False = off (opt-in), True = on


def use_pallas_gather(enabled) -> None:
    """Route ``ops.mxu_gather.onehot_gather_multi`` (and so the exact
    engine's hot gathers) through this kernel.  Opt-in: the +9% MAC-rate
    win (docs/PERF.md round 3) is enabled for benchmarking/measured
    configs; ``None``/``False`` keep the XLA-level formulation."""
    global _USE_PALLAS
    _USE_PALLAS = enabled if enabled is None else bool(enabled)


def pallas_gather_enabled() -> bool:
    return bool(_USE_PALLAS)


def _gather_kernel(nplanes: int, rows: int, width: int, idx_ref,
                   planes_ref, out_ref):
    chunk = idx_ref.shape[2]
    nfields = nplanes // 4
    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (width, chunk), 0)
    for s in range(_SUB):
        idx2 = idx_ref[0, s:s + 1, :]         # [1, chunk]
        row_blk = idx2 // width               # [1, chunk]
        col_blk = idx2 % width
        onehot_rT = (riota == row_blk).astype(jnp.bfloat16)  # [rows, chunk]
        onehot_cT = (ciota == col_blk).astype(jnp.bfloat16)  # [width, chunk]
        for f in range(nfields):
            acc = None
            for k in range(4):
                plane = planes_ref[f * 4 + k]  # [rows, width] bf16
                # pickedT[w, j] = plane[row_j, w] — contract rows on the
                # MXU; f32 accumulator (Mosaic requires 32-bit matmul acc;
                # pickedT never leaves VMEM so width doesn't cost HBM)
                pickedT = jax.lax.dot_general(
                    plane, onehot_rT, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [width, chunk]
                prod = pickedT * onehot_cT.astype(jnp.float32)
                byte = jnp.sum(prod, axis=0, keepdims=True)  # [1, chunk]
                # Mosaic lowers f32->i32 but not f32->u32; i32 shifts/ors
                # produce the same bit pattern (byte <= 255, shift <= 24)
                d = byte.astype(jnp.int32) << np.int32(8 * k)
                acc = d if acc is None else acc | d
            out_ref[f, 0, s:s + 1, :] = \
                jax.lax.bitcast_convert_type(acc, jnp.float32)


def pallas_onehot_gather(flats, idx, row_width: int = 256,
                         chunk: int = 512, interpret: bool = False):
    """out[f][i] = flats[f][idx[i]], bit-exact, picked stays in VMEM.

    ``flats``: tuple of f32[M] (M % row_width == 0); ``idx``: i32[N] in
    [0, M).  Returns a tuple of f32[N].  Each grid program handles
    ``8 * chunk`` indices.
    """
    m = flats[0].shape[0]
    assert m % row_width == 0
    rows = m // row_width
    n = idx.shape[0]
    blk = _SUB * chunk
    pad = (-n) % blk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    g = idx.shape[0] // blk
    idx3d = idx.reshape(g, _SUB, chunk).astype(jnp.int32)
    planes = jnp.stack([p for f in flats
                        for p in _byte_planes(f.reshape(rows, row_width))])
    nplanes = planes.shape[0]
    nfields = nplanes // 4

    out = pl.pallas_call(
        partial(_gather_kernel, nplanes, rows, row_width),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, _SUB, chunk), lambda i: (i, 0, 0)),
            pl.BlockSpec((nplanes, rows, row_width), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nfields, 1, _SUB, chunk),
                               lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nfields, g, _SUB, chunk),
                                       jnp.float32),
        interpret=interpret,
    )(idx3d, planes)
    return tuple(out[f].reshape(-1)[:n] for f in range(nfields))
