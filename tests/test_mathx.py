"""mathx contract tests: accuracy vs float64 references, and bitwise
numpy-vs-jit(XLA) parity for every kernel the simulation uses."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import erfinv as sp_erfinv

from die_tpu.core import mathx as M

RNG = np.random.default_rng(0)
N = 20000


def _max_rel(mine, ref):
    mine = np.asarray(mine).astype(np.float64)
    err = np.abs(mine - ref)
    scale = np.maximum(np.abs(ref), 1e-6)
    return float(np.max(err / scale))


def test_sincos_accuracy():
    th = RNG.uniform(-7, 7, N).astype(np.float32)
    s, c = M.sincos(th)
    assert np.max(np.abs(s - np.sin(th.astype(np.float64)))) < 2e-7
    assert np.max(np.abs(c - np.cos(th.astype(np.float64)))) < 2e-7


def test_atan2_accuracy_and_edges():
    y = RNG.uniform(-2, 2, N).astype(np.float32)
    x = RNG.uniform(-2, 2, N).astype(np.float32)
    assert np.max(np.abs(M.atan2(y, x).astype(np.float64)
                         - np.arctan2(y.astype(np.float64),
                                      x.astype(np.float64)))) < 4e-7
    assert M.atan2(np.float32(0), np.float32(0)) == 0.0
    assert abs(M.atan2(np.zeros(1, np.float32),
                       -np.ones(1, np.float32))[0] - np.pi) < 1e-6


def test_recip_sqrt_accuracy():
    a = RNG.uniform(1e-5, 1e4, N).astype(np.float32)
    assert _max_rel(M.recip(a), 1 / a.astype(np.float64)) < 3e-7
    assert _max_rel(M.sqrt(a), np.sqrt(a.astype(np.float64))) < 3e-7
    assert M.sqrt(np.float32(0.0)) == 0.0
    assert float(np.asarray(M.recip(np.float32(-2.0))).ravel()[0]) == \
        pytest.approx(-0.5, rel=1e-6)


def test_erfinv_accuracy():
    xs = RNG.uniform(-0.999999, 0.999999, N).astype(np.float32)
    assert np.max(np.abs(M.erfinv(xs).astype(np.float64)
                         - sp_erfinv(xs.astype(np.float64)))) < 2e-6


def test_exp_tanh_accuracy():
    t = RNG.uniform(-6, 6, N).astype(np.float32)
    assert _max_rel(M.exp(t), np.exp(t.astype(np.float64))) < 4e-7
    assert np.max(np.abs(M.tanh(t).astype(np.float64)
                         - np.tanh(t.astype(np.float64)))) < 4e-7


def test_normal_distribution():
    from die_tpu.core.rng import np_key, np_random_bits, uniform01_from_bits

    u = uniform01_from_bits(np_random_bits(np_key(7), (200000,)))
    nm = M.normal_from_uniform(u)
    assert abs(float(nm.mean())) < 0.01
    assert abs(float(nm.std()) - 1.0) < 0.01
    assert np.all(np.isfinite(nm))


def test_renormalize_radians_range():
    th = RNG.uniform(-10, 10, N).astype(np.float32)
    r = M.renormalize_radians(th)
    assert r.min() > -np.pi - 1e-5
    assert r.max() <= np.pi + 1e-5


def test_bitwise_jit_parity():
    th = RNG.uniform(-7, 7, N).astype(np.float32)
    y = RNG.uniform(-2, 2, N).astype(np.float32)
    x = RNG.uniform(-2, 2, N).astype(np.float32)
    u = RNG.uniform(1e-7, 1 - 1e-7, N).astype(np.float32)
    xs = RNG.uniform(-0.999999, 0.999999, N).astype(np.float32)
    a = RNG.uniform(1e-5, 100, N).astype(np.float32)
    tz = RNG.uniform(-6, 6, N).astype(np.float32)

    def allfn(th, y, x, u, xs, a, tz):
        s, c = M.sincos(th)
        return (s, c, M.atan2(y, x), M.erfinv(xs), M.recip(a), M.sqrt(a),
                M.exp(tz), M.tanh(tz), M.hypot2(y, x),
                M.renormalize_radians(th),
                M.discretize(th, np.float32(0.5235988)),
                M.round3(u), M.wrap01(th), M.normal_from_uniform(u),
                M.tree_sum(xs))

    args = (th, y, x, u, xs, a, tz)
    res_np = allfn(*args)
    res_j = jax.jit(allfn)(*[jnp.asarray(v) for v in args])
    names = ["sin", "cos", "atan2", "erfinv", "recip", "sqrt", "exp", "tanh",
             "hypot2", "renorm", "discretize", "round3", "wrap01", "normal",
             "tree_sum"]
    for name, a_np, a_j in zip(names, res_np, res_j):
        assert np.array_equal(np.asarray(a_np), np.asarray(a_j)), name
