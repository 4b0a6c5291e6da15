"""Separable Gaussian stencil — the chem diffusion / sense-mask operator.

Twin of ``skimage.filters.gaussian(..., sigma, mode, preserve_range=True)``
as used at core/env.py:140-143 (diffusion, mode='wrap') and core/env.py:285
(sense mask, sigma=2.0, default mode='nearest').  scikit-image delegates to
``scipy.ndimage.gaussian_filter``: per-axis correlation with a truncated
(truncate=4.0) normalized Gaussian, applied along axis 0 then axis 1.

This implementation pins the fp32 contract shared by the NumPy oracle and the
TPU engine: tap weights are computed in float64 and cast to fp32 once, and the
tap accumulation order is fixed (offset -r .. +r, left to right), so both
backends produce bitwise-identical results.  Backend-generic: works on np or
jnp arrays (roll / clipped-take / arithmetic only).

The XLA lowering of this function is a fused chain of rolls+FMAs; see
``die_tpu/ops/pallas_kernels.py`` for the hand-fused Pallas variant used on
the hot path.
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from die_tpu.core.mathx import xp_of, xroll


@lru_cache(maxsize=None)
def gaussian_taps(sigma: float, truncate: float = 4.0) -> tuple:
    """fp32 tap weights for offsets -r..+r (normalized), r = int(t*sigma+0.5)."""
    radius = int(truncate * float(sigma) + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (xs / float(sigma)) ** 2)
    w = w / w.sum()
    return tuple(np.float32(v) for v in w)


def _axis_pass_wrap(field, taps, axis: int):
    xp = xp_of(field)
    radius = (len(taps) - 1) // 2
    acc = None
    for k, w in enumerate(taps):
        offset = k - radius  # tap at f[i + offset]
        # zero-shift roll lowers to a 0-sized slice in Mosaic — skip it
        shifted = xroll(xp, field, -offset, axis) if offset else field
        term = w * shifted
        acc = term if acc is None else acc + term
    return acc


def _axis_pass_nearest(field, taps, axis: int):
    xp = xp_of(field)
    radius = (len(taps) - 1) // 2
    n = field.shape[axis]
    idx_base = np.arange(n, dtype=np.int32)
    acc = None
    for k, w in enumerate(taps):
        offset = k - radius
        idx = np.clip(idx_base + offset, 0, n - 1)
        shifted = xp.take(field, xp.asarray(idx), axis=axis)
        term = w * shifted
        acc = term if acc is None else acc + term
    return acc


def separable_gaussian(field, sigma: float, mode: str = "wrap", truncate: float = 4.0):
    """2D Gaussian blur over the trailing two axes of ``field`` ([..., W, H])."""
    taps = gaussian_taps(sigma, truncate)
    ax0 = field.ndim - 2
    ax1 = field.ndim - 1
    if mode == "wrap":
        out = _axis_pass_wrap(field, taps, ax0)
        out = _axis_pass_wrap(out, taps, ax1)
    elif mode == "nearest":
        out = _axis_pass_nearest(field, taps, ax0)
        out = _axis_pass_nearest(out, taps, ax1)
    else:
        raise ValueError(f"unsupported gaussian mode: {mode!r}")
    return out


def central_gradient(field):
    """Twin of ``np.gradient(field)`` (core/agent/gradient.py:57): 2nd-order
    central differences in the interior, one-sided at the edges (NOT wrapped —
    unlike the diffusion stencil; see SURVEY §3 trace C).

    Returns (d/daxis0, d/daxis1) over the trailing two axes.
    """
    xp = xp_of(field)
    half = np.float32(0.5)

    def one_axis(f, axis):
        n = f.shape[axis]
        fwd = xp.roll(f, -1, axis=axis)
        bwd = xp.roll(f, 1, axis=axis)
        interior = (fwd - bwd) * half
        # one-sided edges: first = f[1]-f[0], last = f[-1]-f[-2]
        first = xp.take(f, xp.asarray(np.arange(1, 2, dtype=np.int32)), axis=axis) - xp.take(
            f, xp.asarray(np.arange(0, 1, dtype=np.int32)), axis=axis
        )
        last = xp.take(f, xp.asarray(np.arange(n - 1, n, dtype=np.int32)), axis=axis) - xp.take(
            f, xp.asarray(np.arange(n - 2, n - 1, dtype=np.int32)), axis=axis
        )
        idx = np.arange(n, dtype=np.int32)
        pos = idx.reshape([-1 if a == axis else 1 for a in range(f.ndim)])
        pos = xp.asarray(pos)
        out = xp.where(pos == 0, first, xp.where(pos == n - 1, last, interior))
        return out

    return one_axis(field, field.ndim - 2), one_axis(field, field.ndim - 1)
