"""Shared-op tests: gaussian stencil, central gradient, perlin, waves, conv —
accuracy vs scipy/numpy references and bitwise numpy-vs-jit parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter

from die_tpu.core.rng import np_key, np_random_bits
from die_tpu.ops.convops import circular_conv
from die_tpu.ops.gaussian import central_gradient, separable_gaussian
from die_tpu.ops.perlin import (
    lattice_gradients_jax,
    lattice_gradients_np,
    perlin_field,
)
from die_tpu.ops.waves import wave_field

RNG = np.random.default_rng(1)


@pytest.mark.parametrize("sigma,mode", [(0.5, "wrap"), (0.8, "wrap"),
                                        (2.0, "nearest")])
def test_gaussian_matches_scipy(sigma, mode):
    f = RNG.random((32, 24)).astype(np.float32)
    ours = separable_gaussian(f, sigma, mode)
    ref = gaussian_filter(f.astype(np.float64), sigma=sigma, mode=mode,
                          truncate=4.0)
    assert np.max(np.abs(ours - ref)) < 1e-6


@pytest.mark.parametrize("sigma,mode", [(0.5, "wrap"), (2.0, "nearest")])
def test_gaussian_bitwise_jit(sigma, mode):
    f = RNG.random((32, 24)).astype(np.float32)
    a = separable_gaussian(f, sigma, mode)
    b = np.asarray(jax.jit(
        lambda x: separable_gaussian(x, sigma, mode))(jnp.asarray(f)))
    assert np.array_equal(a, b)


def test_central_gradient_matches_numpy():
    f = RNG.random((17, 23)).astype(np.float32)
    gx, gy = central_gradient(f)
    rx, ry = np.gradient(f)
    assert np.array_equal(gx, rx.astype(np.float32))
    assert np.array_equal(gy, ry.astype(np.float32))


def test_central_gradient_bitwise_jit():
    f = RNG.random((17, 23)).astype(np.float32)
    gx, gy = central_gradient(f)
    jx, jy = jax.jit(central_gradient)(jnp.asarray(f))
    assert np.array_equal(gx, np.asarray(jx))
    assert np.array_equal(gy, np.asarray(jy))


def test_perlin_parity_and_stats():
    import jax.random as jr

    octaves = 8
    gn = lattice_gradients_np(np_key(5), octaves)
    gj = lattice_gradients_jax(jr.PRNGKey(5), octaves)
    assert np.array_equal(gn, np.asarray(gj))

    pn = perlin_field(gn, (64, 48), octaves)
    pj = np.asarray(jax.jit(
        lambda g: perlin_field(g, (64, 48), octaves))(gj))
    assert np.array_equal(pn, pj)
    # smooth zero-mean noise with reasonable amplitude
    assert abs(float(pn.mean())) < 0.2
    assert 0.05 < float(pn.std()) < 0.6
    assert float(np.abs(pn).max()) <= 1.0


def test_wave_field_parity():
    t = np.float32(0.37)
    wn = wave_field((32, 40), t)
    wj = np.asarray(jax.jit(lambda tt: wave_field((32, 40), tt))(jnp.float32(t)))
    assert np.array_equal(wn, wj)
    assert wn.shape == (32, 40)
    assert np.all(np.isfinite(wn))


def test_circular_conv_matches_direct():
    """Cross-check the roll-based conv against a brute-force wrap conv."""
    field = RNG.random((3, 8, 9)).astype(np.float32)
    kernel = RNG.random((2, 3, 3, 3)).astype(np.float32) - 0.5
    out = circular_conv(field, kernel)
    W, H = 8, 9
    ref = np.zeros((2, W, H), np.float64)
    for o in range(2):
        for x in range(W):
            for y in range(H):
                s = 0.0
                for i in range(3):
                    for du in range(3):
                        for dv in range(3):
                            s += kernel[o, i, du, dv] * field[
                                i, (x + du - 1) % W, (y + dv - 1) % H]
                ref[o, x, y] = s
    assert np.max(np.abs(out - ref)) < 1e-5


def test_circular_conv_bitwise_jit():
    field = RNG.random((3, 8, 9)).astype(np.float32)
    kernel = RNG.random((3, 3, 3, 3)).astype(np.float32) - 0.5
    a = circular_conv(field, kernel)
    b = np.asarray(jax.jit(circular_conv)(jnp.asarray(field),
                                          jnp.asarray(kernel)))
    assert np.array_equal(a, b)
