"""RNG contract tests: the pure-NumPy threefry must match jax.random
bit-for-bit, and the bits->float transforms must agree across backends."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core.rng import (
    np_fold_in,
    np_key,
    np_random_bits,
    np_split,
    sign_from_bits,
    uniform01_from_bits,
)


@pytest.mark.parametrize("seed", [0, 1, 42, 123456789, 2**31, 2**32 - 1])
def test_key(seed):
    assert np.array_equal(np.asarray(jr.PRNGKey(seed)), np_key(seed))


@pytest.mark.parametrize("shape", [(1,), (7,), (8,), (2, 3, 5), (65536,), ()])
def test_bits(shape):
    k = jr.PRNGKey(42)
    nk = np_key(42)
    assert np.array_equal(np.asarray(jr.bits(k, shape, jnp.uint32)),
                          np_random_bits(nk, shape))


@pytest.mark.parametrize("data", [0, 1, 7, 123456, 2**31 + 5])
def test_fold_in(data):
    k = jr.PRNGKey(7)
    nk = np_key(7)
    assert np.array_equal(np.asarray(jr.fold_in(k, data)),
                          np_fold_in(nk, data))


def test_fold_chain_and_bits():
    k = jr.fold_in(jr.fold_in(jr.PRNGKey(3), 11), 5)
    nk = np_fold_in(np_fold_in(np_key(3), 11), 5)
    assert np.array_equal(np.asarray(jr.bits(k, (1000,), jnp.uint32)),
                          np_random_bits(nk, (1000,)))


@pytest.mark.parametrize("num", [2, 5, 16])
def test_split(num):
    k = jr.PRNGKey(9)
    nk = np_key(9)
    assert np.array_equal(np.asarray(jr.split(k, num)), np_split(nk, num))


def test_uniform01_range_and_parity():
    bits = np_random_bits(np_key(1), (100000,))
    u = uniform01_from_bits(bits)
    assert u.dtype == np.float32
    assert u.min() > 0.0 and u.max() < 1.0
    uj = np.asarray(jax.jit(uniform01_from_bits)(jnp.asarray(bits)))
    assert np.array_equal(u, uj)


def test_sign_from_bits_parity():
    bits = np_random_bits(np_key(2), (10000,))
    s = sign_from_bits(bits)
    assert set(np.unique(s)) == {-1.0, 1.0}
    sj = np.asarray(jax.jit(sign_from_bits)(jnp.asarray(bits)))
    assert np.array_equal(s, sj)
