"""Counter-based RNG contract shared by the TPU engine and the NumPy oracle.

The reference (gkirgizov/die) draws randomness from three uncoordinated sources
(global ``np.random`` at core/data_init.py:168, a ``default_rng`` Generator at
core/agent/gradient.py:34, and ``np.random.randint`` at core/agent/gradient.py:181),
which makes seeded reproduction impossible (``Env.reset`` even ignores its seed,
core/env.py:94-99).  This framework replaces all of them with one explicit,
counter-based contract:

* Keys are JAX threefry2x32 keys (``uint32[2]``).
* The same key stream is computable in pure NumPy (this module) and in JAX
  (``jax.random.bits`` / ``fold_in`` / ``split``), bit-for-bit, on any backend —
  threefry is integer arithmetic, which XLA executes exactly.
* Floating-point draws (uniform / normal / signs) are defined *here* as explicit
  arithmetic on the raw bits (see ``uniform01_from_bits`` etc.) rather than via
  backend library routines, so fp32 results are bitwise identical between the
  NumPy oracle and the compiled TPU engine.

Draw-order contract (who folds what) is documented in ``die_tpu/models`` and
``die_tpu/core/init.py``; every consumer derives its key with ``fold_in`` from a
parent key with a fixed constant, so there is no hidden order dependence.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "np_key",
    "np_threefry2x32",
    "np_random_bits",
    "np_fold_in",
    "np_split",
    "uniform01_from_bits",
    "sign_from_bits",
    "UNIFORM_EPS",
]

_ROTATIONS = ((13, 15, 26, 6), (17, 29, 16, 24))

# Offset added to uniform bits-derived floats so draws lie in (0, 1): keeps
# log(1 - x**2) finite inside the normal() transform for every possible bit
# pattern.  Part of the fp32 contract — same constant on both backends.
UNIFORM_EPS = np.float32(2.0**-24)


def np_key(seed: int) -> np.ndarray:
    """NumPy twin of ``jax.random.PRNGKey(seed)`` (threefry2x32 impl).

    Matches JAX with x64 disabled (the default runtime config): the high key
    word is zero and the seed is taken modulo 2**32.
    """
    seed = int(seed)
    return np.array([np.uint32(0), np.uint32(seed & 0xFFFFFFFF)], dtype=np.uint32)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint32(r)
    return ((x << r) | (x >> np.uint32(32 - int(r)))).astype(np.uint32)


def np_threefry2x32_pair(keypair: np.ndarray, x0: np.ndarray, x1: np.ndarray):
    """Elementwise threefry2x32 block cipher (the ``threefry2x32_p`` primitive).

    ``keypair``: uint32[2]; ``x0``/``x1``: uint32 arrays of one common shape.
    Returns the two encrypted output words with that same shape.
    """
    x0 = np.asarray(x0, np.uint32).copy()
    x1 = np.asarray(x1, np.uint32).copy()
    with np.errstate(over="ignore"):
        ks0 = np.uint32(keypair[0])
        ks1 = np.uint32(keypair[1])
        ks2 = np.uint32(ks0 ^ ks1 ^ np.uint32(0x1BD11BDA))
        ks = (ks0, ks1, ks2)
        x0 = (x0 + ks0).astype(np.uint32)
        x1 = (x1 + ks1).astype(np.uint32)
        for i in range(5):
            for r in _ROTATIONS[i % 2]:
                x0 = (x0 + x1).astype(np.uint32)
                x1 = _rotl(x1, r)
                x1 = (x1 ^ x0).astype(np.uint32)
            x0 = (x0 + ks[(i + 1) % 3]).astype(np.uint32)
            x1 = (x1 + ks[(i + 2) % 3] + np.uint32(i + 1)).astype(np.uint32)
    return x0, x1


def np_threefry2x32(keypair: np.ndarray, count: np.ndarray) -> np.ndarray:
    """NumPy twin of ``jax._src.prng.threefry_2x32`` (counter-mode hash)."""
    count = np.asarray(count, dtype=np.uint32)
    odd = count.size % 2
    flat = count.ravel()
    if odd:
        flat = np.concatenate([flat, np.zeros(1, np.uint32)])
    x0, x1 = np.split(flat, 2)
    y0, y1 = np_threefry2x32_pair(keypair, x0, x1)
    out = np.concatenate([y0, y1])
    if odd:
        out = out[:-1]
    return out.reshape(count.shape)


def np_random_bits(key: np.ndarray, shape) -> np.ndarray:
    """NumPy twin of ``jax.random.bits(key, shape, jnp.uint32)``.

    Matches JAX's default partitionable threefry: per-element 64-bit counter
    split into (hi, lo) words, block-encrypted, halves xor'd together.
    """
    size = int(np.prod(shape, dtype=np.int64)) if shape else 1
    counts = np.arange(size, dtype=np.uint64)
    hi = (counts >> np.uint64(32)).astype(np.uint32)
    lo = counts.astype(np.uint32)
    b0, b1 = np_threefry2x32_pair(key, hi, lo)
    return (b0 ^ b1).reshape(shape)


def np_fold_in(key: np.ndarray, data: int) -> np.ndarray:
    """NumPy twin of ``jax.random.fold_in(key, data)``."""
    return np_threefry2x32(key, np_key(np.uint32(data)))


def np_split(key: np.ndarray, num: int = 2) -> np.ndarray:
    """NumPy twin of ``jax.random.split(key, num)`` (fold-like variant)."""
    counts = np.arange(num, dtype=np.uint64)
    hi = (counts >> np.uint64(32)).astype(np.uint32)
    lo = counts.astype(np.uint32)
    b0, b1 = np_threefry2x32_pair(key, hi, lo)
    return np.stack([b0, b1], axis=1)


_MUR_C1 = np.uint32(0x85EBCA6B)
_MUR_C2 = np.uint32(0xC2B2AE35)


def murmur_finalize(h):
    """murmur3 fmix32 avalanche — backend-generic u32 ops.

    Used by the fast engine's cheap per-cell RNG: ~10 vector ops versus
    ~100 for the threefry cipher, with avalanche quality ample for per-cell
    tie-break decisions.  Part of the bit-contract (oracle shares it).
    """
    h = h ^ (h >> np.uint32(16))
    h = h * _MUR_C1
    h = h ^ (h >> np.uint32(13))
    h = h * _MUR_C2
    h = h ^ (h >> np.uint32(16))
    return h


def np_murmur_bits(key: np.ndarray, shape) -> np.ndarray:
    """Counter-mode murmur hash bits: finalize(finalize(counter ^ k0) ^ k1)."""
    size = int(np.prod(shape, dtype=np.int64)) if shape else 1
    counts = np.arange(size, dtype=np.uint32).reshape(shape)
    with np.errstate(over="ignore"):
        h = murmur_finalize(counts ^ np.uint32(key[0]))
        h = murmur_finalize(h ^ np.uint32(key[1]))
    return h


def uniform01_from_bits(bits):
    """uint32 bits -> fp32 uniform in (0, 1).  Arithmetic-only; backend-generic.

    Uses the top 23 bits as a mantissa and offsets by 2**-24 so 0.0 is never
    produced (keeps downstream ``log`` finite).  Works on np or jnp arrays.
    """
    shifted = (bits >> np.uint32(9)).astype(np.float32)
    return shifted * np.float32(2.0**-23) + UNIFORM_EPS


def sign_from_bits(bits):
    """uint32 bits -> fp32 in {-1.0, +1.0} from the low bit (backend-generic).

    Twin of the reference's ``(np.random.randint(0, 2, shape) - 0.5) * 2``
    (core/agent/gradient.py:181).
    """
    low = (bits & np.uint32(1)).astype(np.float32)
    return low * np.float32(2.0) - np.float32(1.0)


def jnp_threefry2x32_pair(k0, k1, x0, x1):
    """jnp twin of :func:`np_threefry2x32_pair` — pure u32 arithmetic, so it
    lowers inside Pallas kernels (scalars or arrays).  Bitwise-identical to
    jax.random's threefry2x32 primitive."""
    import jax.numpy as jnp

    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks0 = jnp.asarray(k0, jnp.uint32)
    ks1 = jnp.asarray(k1, jnp.uint32)
    ks2 = ks0 ^ ks1 ^ np.uint32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)

    def rotl(v, r):
        return (v << np.uint32(r)) | (v >> np.uint32(32 - r))

    x0 = x0 + ks0
    x1 = x1 + ks1
    for i in range(5):
        for r in _ROTATIONS[i % 2]:
            x0 = x0 + x1
            x1 = rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
    return x0, x1


def jnp_fold_in_scalars(k0, k1, data):
    """jnp twin of ``jax.random.fold_in(key, data)`` on u32 scalars
    (np_fold_in semantics: new key = threefry2x32(key, [0, data]))."""
    import jax.numpy as jnp

    y0, y1 = jnp_threefry2x32_pair(k0, k1, jnp.uint32(0),
                                   jnp.asarray(data, jnp.uint32))
    return y0, y1


def jnp_threefry_bits_2d(k0, k1, shape):
    """jnp twin of ``np_random_bits(key, shape)`` for 2D shapes, built from
    broadcasted iotas only (Pallas-kernel-legal).  hi = 0 (fits u32 counts),
    lo = row-major flat index, out = b0 ^ b1."""
    import jax
    import jax.numpy as jnp

    H = shape[1]
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    lo = row * np.uint32(H) + col
    hi = jnp.zeros(shape, jnp.uint32)
    b0, b1 = jnp_threefry2x32_pair(k0, k1, hi, lo)
    return b0 ^ b1
