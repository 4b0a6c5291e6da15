"""Vectorized 2D Perlin gradient noise — jittable, backend-generic.

Replaces the reference's per-pixel pure-Python ``perlin_noise`` loop
(core/data_init.py:190-196 — the slowest code in the reference repo) with a
fully vectorized lattice evaluation: hash-free gradients drawn from the
counter-based RNG contract, quintic fade, bilinear gradient interpolation.
Identical arithmetic on numpy and jax arrays (same RNG bits, same op order)
so field initialization is bit-for-bit reproducible between the oracle and
the TPU engine.

This is a *capability* twin, not a bit-twin of the ``perlin_noise`` package:
the reference's field statistics (zero-mean smooth noise, amplitude ~0.5,
``octaves`` controlling lattice frequency, 3-decimal rounding) are preserved;
the exact stream of values is defined by this spec.
"""
from __future__ import annotations

import numpy as np

from die_tpu.core.mathx import PI, round3, xp_of
from die_tpu.core.rng import np_random_bits, uniform01_from_bits


def lattice_gradients_np(key: np.ndarray, octaves: int) -> np.ndarray:
    """Unit gradient vectors on the (octaves+1)^2 lattice from a numpy key.

    Returns fp32 array [2, octaves+1, octaves+1].  Drawn as a uniform angle
    (arithmetic-only transform of raw bits) so both backends agree bitwise.
    """
    from die_tpu.core.mathx import sincos

    n = octaves + 1
    bits = np_random_bits(key, (n, n))
    u = uniform01_from_bits(bits)
    theta = (np.float32(2.0) * u - np.float32(1.0)) * PI
    s, c = sincos(theta)
    return np.stack([c, s]).astype(np.float32)


def lattice_gradients_jax(key, octaves: int):
    """JAX twin of :func:`lattice_gradients_np` (same bits, same transform)."""
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core.mathx import sincos

    n = octaves + 1
    bits = jr.bits(key, (n, n), jnp.uint32)
    u = uniform01_from_bits(bits)
    theta = (np.float32(2.0) * u - np.float32(1.0)) * PI
    s, c = sincos(theta)
    return jnp.stack([c, s])


def _fade(t):
    """Quintic smoothstep 6t^5 - 15t^4 + 10t^3."""
    a = np.float32(6.0)
    b = np.float32(-15.0)
    c = np.float32(10.0)
    return t * t * t * (c + t * (b + t * a))


def perlin_field(gradients, size_wh, octaves: int):
    """Evaluate Perlin noise on the [0,1]^2 grid of shape ``(W, H)``.

    ``gradients``: [2, octaves+1, octaves+1] unit vectors (np or jnp).
    Sample points are ``linspace(0,1,W) x linspace(0,1,H)`` scaled by
    ``octaves`` (the reference's frequency semantics, core/data_init.py:190-196).
    Output is rounded to 3 decimals like the reference's ``.round(3)``.
    """
    xp = xp_of(gradients)
    W, H = size_wh
    o = octaves

    def axis_coords(n):
        step = np.float32(float(o) / (n - 1))
        p = np.arange(n, dtype=np.float32) * step  # in [0, o]
        i0 = np.minimum(np.floor(p), np.float32(o - 1)).astype(np.int32)
        t = p - i0.astype(np.float32)
        return xp.asarray(i0), xp.asarray(t)

    ix0, tx = axis_coords(W)
    iy0, ty = axis_coords(H)

    gx = gradients[0]
    gy = gradients[1]

    def corner_dot(dx_i, dy_i):
        # gradient at lattice corner (ix0+dx_i, iy0+dy_i) dotted with the
        # displacement from that corner to the sample point
        ix = ix0 + dx_i
        iy = iy0 + dy_i
        g0 = gx[ix][:, iy]  # [W, H]
        g1 = gy[ix][:, iy]
        rx = (tx - np.float32(dx_i))[:, None]
        ry = (ty - np.float32(dy_i))[None, :]
        return g0 * rx + g1 * ry

    n00 = corner_dot(0, 0)
    n10 = corner_dot(1, 0)
    n01 = corner_dot(0, 1)
    n11 = corner_dot(1, 1)

    ux = _fade(tx)[:, None]
    uy = _fade(ty)[None, :]
    nx0 = n00 + ux * (n10 - n00)
    nx1 = n01 + ux * (n11 - n01)
    val = nx0 + uy * (nx1 - nx0)
    return round3(val)
