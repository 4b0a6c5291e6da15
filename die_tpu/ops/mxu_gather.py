"""MXU one-hot gather: random access as matmul, bitwise-exact.

XLA:TPU lowers ``jnp.take`` with arbitrary indices to a serialized loop
(~17 ns/element measured on v5e, docs/PERF.md).  This formulation routes the
row selection through the MXU and the column selection through a one-hot
multiply+reduce — no gather/scatter primitive anywhere:

    field: f32[R, C]      (the flat field reshaped, C = lane width)
    rows_g = onehot(r) @ field          # [CH, R] @ [R, C] — MXU
    out    = sum(rows_g * onehot(c), 1) # one-hot column pick — VPU

Exactness: each f32 value travels as its four BYTE PLANES (integers in
[0, 255], exact in bf16), one single-pass bf16 dot per plane with f32
accumulation; the one-hot side is exactly 0/1, so every accumulation is
"one byte plus zeros", and the reconstructed u32 is the original f32 bit
pattern — including -0.0, subnormals, and NaN payloads.  The result is
bit-identical to ``jnp.take`` (asserted in tests).  (An earlier
formulation used precision=HIGHEST bf16x3 splitting — 6 passes vs 4, see
docs/PERF.md round 2.)

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


def _byte_planes(field):
    """The four bytes of each f32's bit pattern as bf16 planes.

    Every plane value is an integer in [0, 255] — exactly representable in
    bf16 (8-bit mantissa), so a single-pass bf16 one-hot matmul with f32
    accumulation moves it exactly (materializing the planes in bf16 also
    halves the HBM traffic of the hot dots).  Reconstructing the u32 in integer arithmetic
    and bitcasting back yields the original f32 BIT PATTERN for every input:
    +-0, subnormals, NaN, inf.  (A hi/mid/lo bf16 value split is one dot
    cheaper but loses f32-subnormal payloads — which chem fields really
    reach, the diffusion tails decay below 1e-38 — and folds -0 into +0,
    which Physarum's atan2 observes at grad-clipped cells.)"""
    bits = jax.lax.bitcast_convert_type(field, jnp.uint32)
    return tuple(
        ((bits >> np.uint32(8 * k)) & np.uint32(0xFF)).astype(jnp.bfloat16)
        for k in range(4))


def onehot_gather_flat(flat, idx, row_width: int = None, chunk: int = 2048):
    """out[i] = flat[idx[i]] via the MXU one-hot two-stage formulation.

    ``flat``: f32[M] with M % row_width == 0; ``idx``: i32[N] in [0, M).
    N is padded up to a multiple of ``chunk`` internally.
    ``row_width=None`` picks 256 when M allows it, else 128 (the 256-wide
    dot measured +6%% end-to-end MAC rate — docs/PERF.md round 3).

    Each byte plane rides a single-pass bf16 dot with f32 accumulation —
    the one-hot side is exact in bf16, byte values are exact in bf16,
    every product is 0 or the byte, and accumulating one byte plus zeros
    is exact — then a one-hot column multiply+reduce (f32 integer
    arithmetic <= 255, exact on any backend, no subnormal flushing).
    4 MXU passes vs 6 for precision=HIGHEST.
    Bit-equality vs jnp.take is asserted in tests/test_mxu_gather.py
    (including -0 and subnormal cells)."""
    return onehot_gather_multi((flat,), idx, row_width, chunk)[0]


def onehot_gather_multi(flats, idx, row_width: int = None,
                        chunk: int = 2048):
    """Gather K fields at the same indices, sharing one one-hot
    construction per chunk: returns a tuple of f32[N], each bit-identical
    to ``jnp.take`` (byte-plane formulation — see onehot_gather_flat).
    The MXU MAC count still scales with K, but the one-hot build, index
    math, and XLA-level plumbing amortize.

    With ``ops.pallas_gather.use_pallas_gather(True)`` and a 256-divisible
    field, the call routes through the fused Pallas kernel instead (picked
    intermediate stays in VMEM; measured +9%% MAC rate at shape —
    docs/PERF.md round 3); results are bit-identical either way."""
    m = flats[0].shape[0]
    from die_tpu.ops.pallas_gather import (pallas_gather_enabled,
                                           pallas_onehot_gather)

    if pallas_gather_enabled() and m % 256 == 0:
        interpret = jax.default_backend() != "tpu"
        return pallas_onehot_gather(flats, idx, row_width=256, chunk=1024,
                                    interpret=interpret)
    if row_width is None:
        row_width = 256 if m % 256 == 0 else 128
    assert m % row_width == 0
    rows = m // row_width
    fields = [f.reshape(rows, row_width) for f in flats]
    n = idx.shape[0]
    pad = (-n) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    r = (idx // row_width).astype(jnp.int32).reshape(-1, chunk)
    c = (idx % row_width).astype(jnp.int32).reshape(-1, chunk)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, row_width), 1)
    all_planes = [_byte_planes(f) for f in fields]

    def one_chunk(args):
        # per-plane narrow dots, each fusing into its column pick — a
        # single wide dot over concatenated planes was measured ~1.7x
        # SLOWER end-to-end (the [chunk, 4K*row_width] picked intermediate
        # materializes instead of fusing; docs/PERF.md round-2b).
        # The picked intermediate is HBM traffic (XLA materializes matmul
        # outputs), so it rides in bf16: byte values <= 255 are exact, and
        # the one-hot column pick adds one nonzero to zeros — exact in any
        # precision (docs/PERF.md round 3: the gathers are HBM-bound on
        # this intermediate, not MXU-bound).
        rc, cc = args
        onehot_r = (row_iota == rc[:, None]).astype(jnp.bfloat16)
        onehot_c = (col_iota == cc[:, None]).astype(jnp.bfloat16)
        outs = []
        for planes in all_planes:
            acc = None
            for k, p in enumerate(planes):
                picked = jax.lax.dot(onehot_r, p,
                                     preferred_element_type=jnp.bfloat16)
                byte = jnp.sum((picked * onehot_c).astype(jnp.float32),
                               axis=1)
                d = byte.astype(jnp.uint32) << np.uint32(8 * k)
                acc = d if acc is None else acc | d
            outs.append(jax.lax.bitcast_convert_type(acc, jnp.float32))
        return tuple(outs)

    outs = jax.lax.map(one_chunk, (r, c))
    return tuple(o.reshape(-1)[:n] for o in outs)


def onehot_gather_mixed(byte_flats, small_flats, idx, row_width: int = None,
                        chunk: int = 2048):
    """Gather ``byte_flats`` (arbitrary f32 — 4 byte-plane dots each) and
    ``small_flats`` (values exact in bf16, e.g. 0/1 occupancy — 1 dot
    each) at shared indices through ONE one-hot construction per chunk.
    Returns (byte_results, small_results), each bit-identical to
    ``jnp.take``."""
    m = (byte_flats or small_flats)[0].shape[0]
    if row_width is None:
        row_width = 256 if m % 256 == 0 else 128
    assert m % row_width == 0
    rows = m // row_width
    bfields = [f.reshape(rows, row_width) for f in byte_flats]
    sfields = [f.reshape(rows, row_width).astype(jnp.bfloat16)
               for f in small_flats]
    n = idx.shape[0]
    pad = (-n) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    r = (idx // row_width).astype(jnp.int32).reshape(-1, chunk)
    c = (idx % row_width).astype(jnp.int32).reshape(-1, chunk)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, rows), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, row_width), 1)
    all_planes = [_byte_planes(f) for f in bfields]

    def one_chunk(args):
        # bf16 picked intermediates: exact for byte/bf16-exact values, and
        # halves the HBM-bound matmul-output traffic (see onehot_gather_multi)
        rc, cc = args
        onehot_r = (row_iota == rc[:, None]).astype(jnp.bfloat16)
        onehot_c = (col_iota == cc[:, None]).astype(jnp.bfloat16)
        bouts = []
        for planes in all_planes:
            acc = None
            for k, p in enumerate(planes):
                picked = jax.lax.dot(onehot_r, p,
                                     preferred_element_type=jnp.bfloat16)
                byte = jnp.sum((picked * onehot_c).astype(jnp.float32),
                               axis=1)
                d = byte.astype(jnp.uint32) << np.uint32(8 * k)
                acc = d if acc is None else acc | d
            bouts.append(jax.lax.bitcast_convert_type(acc, jnp.float32))
        souts = []
        for f in sfields:
            picked = jax.lax.dot(onehot_r, f,
                                 preferred_element_type=jnp.bfloat16)
            souts.append(jnp.sum((picked * onehot_c).astype(jnp.float32),
                                 axis=1))
        return tuple(bouts), tuple(souts)

    bouts, souts = jax.lax.map(one_chunk, (r, c))
    return (tuple(o.reshape(-1)[:n] for o in bouts),
            tuple(o.reshape(-1)[:n] for o in souts))


def onehot_gather_smallint(flats, idx, row_width: int = 128,
                           chunk: int = 2048):
    """Gather K fields whose VALUES are exactly representable in bf16
    (0/1 flags, integers <= 255, powers of two <= 2^15) at shared indices:
    one one-hot pair per chunk, a single single-pass bf16 dot per field —
    4x cheaper than the byte-plane gather.  NOT safe for arbitrary f32
    (callers guarantee the value range).  Returns a tuple of f32[N], each
    bit-identical to ``jnp.take`` for in-range values."""
    m = flats[0].shape[0]
    assert m % row_width == 0
    rows = m // row_width
    fields = [f.reshape(rows, row_width).astype(jnp.bfloat16) for f in flats]
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
        onehot_r = (row_iota == rc[:, None]).astype(jnp.bfloat16)
        onehot_c = (col_iota == cc[:, None]).astype(jnp.bfloat16)
        outs = []
        for f in fields:
            picked = jax.lax.dot(onehot_r, f,
                                 preferred_element_type=jnp.bfloat16)
            outs.append(jnp.sum((picked * onehot_c).astype(jnp.float32),
                                axis=1))
        return tuple(outs)

    outs = jax.lax.map(one_chunk, (r, c))
    return tuple(o.reshape(-1)[:n] for o in outs)
