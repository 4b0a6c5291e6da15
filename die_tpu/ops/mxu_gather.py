"""MXU one-hot gather: random access as matmul, bitwise-exact.

XLA:TPU lowers ``jnp.take`` with arbitrary indices to a serialized loop
(~17 ns/element measured on v5e, docs/PERF.md).  This formulation routes the
row selection through the MXU and the column selection through a one-hot
multiply+reduce — no gather/scatter primitive anywhere:

    field: f32[R, C]      (the flat field reshaped, C = lane width)
    rows_g = onehot(r) @ field          # [CH, R] @ [R, C] — MXU
    out    = sum(rows_g * onehot(c), 1) # one-hot column pick — VPU

Exactness: with ``precision=HIGHEST`` the f32 operands split into exact
bf16x3 triples; the one-hot operand splits to (1, 0, 0), so each product
reconstructs the field value exactly and every other term is exactly zero —
the result is bit-identical to ``jnp.take`` (asserted in tests).

Chunked over agents via ``lax.map`` so the one-hot intermediates stay small
enough to fuse.  Opt-in via ``use_mxu_gather(True)`` or per-call.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_USE_MXU = None  # None = auto: on for TPU backends, off elsewhere


def use_mxu_gather(enabled) -> None:
    """Route ``core.env.gather_field`` through the MXU formulation.

    ``True``/``False`` force; ``None`` restores auto (TPU only — measured
    8.8 ns/elem vs 16.7 for jnp.take on v5e; on CPU the native gather wins).
    """
    global _USE_MXU
    _USE_MXU = enabled if enabled is None else bool(enabled)


def mxu_gather_enabled() -> bool:
    if _USE_MXU is None:
        try:
            import jax

            return jax.default_backend() == "tpu"
        except Exception:
            return False
    return _USE_MXU


def onehot_gather_flat(flat, idx, row_width: int = 128, chunk: int = 2048):
    """out[i] = flat[idx[i]] via the MXU one-hot two-stage formulation.

    ``flat``: f32[M] with M % row_width == 0; ``idx``: i32[N] in [0, M).
    N is padded up to a multiple of ``chunk`` internally.
    """
    m = flat.shape[0]
    assert m % row_width == 0
    rows = m // row_width
    field = flat.reshape(rows, row_width)
    n = idx.shape[0]
    pad = (-n) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])

    r = (idx // row_width).astype(jnp.int32).reshape(-1, chunk)
    c = (idx % row_width).astype(jnp.int32).reshape(-1, chunk)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, row_width), 1)

    def one_chunk(args):
        rc, cc = args
        onehot_r = (row_iota == rc[:, None]).astype(jnp.float32)
        picked_rows = jax.lax.dot(onehot_r, field,
                                  precision=jax.lax.Precision.HIGHEST)
        onehot_c = (col_iota == cc[:, None]).astype(jnp.float32)
        return jnp.sum(picked_rows * onehot_c, axis=1)

    out = jax.lax.map(one_chunk, (r, c)).reshape(-1)
    return out[:n] if pad else out
