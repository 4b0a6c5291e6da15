"""Analytic time-varying resource fields — twin of ``WaveSequence``
(core/data_init.py:71-89) used by the 'dyn-pred' dynamics preset.

``wave_field(size, t)`` reproduces the reference formula exactly (waves +
moving islands mixture) with the shared fp32 sincos, so the oracle and the
TPU engine agree bitwise.  The reference evaluates it on the ``get_meshgrid``
coordinate layout (core/utils.py:113-118): for ``field_size=(W, H)``,
``grid[0][i, j] = linspace(0,1,H)[j]`` and ``grid[1][i, j] = linspace(0,1,W)[i]``
(xarray's reversed dim order) — preserved here.
"""
from __future__ import annotations

import numpy as np

from die_tpu.core.mathx import PI, order_barrier, sincos, sqrt, xp_of
from die_tpu.ops.perlin import perlin_field


def _iota2d_f32(xp, shape, dim):
    """2D float iota — via broadcasted_iota on jax so the op is legal inside
    Pallas kernels (captured array constants and 1-D iotas are not).  Built
    as an i32 iota converted to f32: Mosaic rejects float iotas outright
    (round-4 real-chip finding), and the convert is bit-identical for any
    iota length this code meets (exact integers < 2**24)."""
    if xp is np:
        n = shape[dim]
        a = np.arange(n, dtype=np.float32)
        return np.broadcast_to(a.reshape((n, 1) if dim == 0 else (1, n)),
                               shape).copy()
    import jax

    return jax.lax.broadcasted_iota(np.int32, shape, dim).astype(np.float32)


def wave_field(size_wh, t):
    """F(t): fp32 [W, H] field for scalar fp32 time ``t`` (np or jnp).

    Stage results pass through :func:`order_barrier` — when the whole
    formula fuses into one XLA computation, the algebraic simplifier
    reorders float arithmetic across stages (measured up to 3584 ulp on
    TPU and unpinned CPU while every isolated stage is bit-exact; the
    barriers restore bitwise oracle parity on the real chip —
    docs/PARITY.md round 4).  No-ops on the numpy oracle and in Mosaic."""
    xp = xp_of(t)
    W, H = size_wh
    two = np.float32(2.0)
    one = np.float32(1.0)
    # reference grid: x varies along axis 1 (H), y along axis 0 (W)
    xs_h = _iota2d_f32(xp, (1, H), 1) * np.float32(1.0 / (H - 1))
    ys_w = _iota2d_f32(xp, (W, 1), 0) * np.float32(1.0 / (W - 1))
    x = xs_h * two - one  # [1, H]
    y = ys_w * two - one  # [W, 1]
    x, y = order_barrier(x, y)

    # sincos ARGUMENTS are barriered: fused, the algebraic simplifier
    # reassociates constant chains through them — (PI*x)*s3 -> x*(PI*s3)
    # and (PI*x)*INV_PIO2 -> x*(PI*INV_PIO2) inside the range reduction —
    # changing bits.  PI*x / PI*y are computed ONCE behind a barrier and
    # reused, so no constant pair is left adjacent to fold.
    r = sqrt(x * x + y * y)  # [W, H]
    px = order_barrier(PI * x)
    py = order_barrier(PI * y)
    sin_x, cos_x = sincos(px)
    sin_04y, _ = sincos(order_barrier(np.float32(0.4) * PI * y))
    r, cos_x, sin_04y = order_barrier(r, cos_x, sin_04y)
    rwave = r + cos_x + sin_04y
    _, z_waves = sincos(order_barrier(PI * (rwave + t)))

    s3 = np.float32(3.0)
    sin_ix, _ = sincos(order_barrier(px * s3 + t))
    _, cos_iy = sincos(order_barrier(py * s3 + t))
    z_waves, sin_ix, cos_iy = order_barrier(z_waves, sin_ix, cos_iy)
    z_islands = sin_ix + cos_iy

    mix = np.float32(0.25)
    return (one - mix) * z_waves + mix * z_islands


def flow_time(flow_cfg, step_index):
    """fp32 time value for integer flow step: t0 + (idx mod n)*dt, cycling —
    twin of iterating ``np.arange(t0, t1, dt)`` with ``itertools.cycle``
    (core/data_init.py:27,40-42)."""
    xp = xp_of(step_index)
    n = flow_cfg.num_steps
    idx = step_index % n
    return np.float32(flow_cfg.t0) + idx.astype(np.float32) * np.float32(flow_cfg.dt)


def flow_field_any(flow_cfg, size_wh, step_index):
    """F(flow_step) for any flow kind — the per-step field consumed by
    ``fast_step_full(flow_field=...)``.  Wave is analytic; perlin draws
    jax.random keys (so neither runs inside Mosaic — callers precompute and
    DMA, see fast/pallas_step.py)."""
    if flow_cfg.kind == "wave":
        return wave_field(size_wh, flow_time(flow_cfg, step_index))
    if flow_cfg.kind == "perlin":
        return perlin_flow_field(flow_cfg, size_wh, step_index)
    raise ValueError(flow_cfg.kind)


def _fade_scalar(t):
    a = np.float32(6.0)
    b = np.float32(-15.0)
    c = np.float32(10.0)
    return t * t * t * (c + t * (b + t * a))


def perlin_flow_field(flow_cfg, size_wh, step_index):
    """Time-varying Perlin field — twin of ``PerlinNoiseSequence``
    (core/data_init.py:55-68).  Smooth in time via quintic interpolation
    between 2D lattice fields keyed per integer time step:
    ``F(t) = lerp(P_k, P_{k+1}, fade(frac))`` with ``tau = t * octaves``.
    Backend-generic: np for the oracle, jnp (jit-safe, traced k) for the
    engine.  Not supported inside Pallas kernels (jax.random draw)."""
    xp = xp_of(step_index)
    o = flow_cfg.octaves
    t = flow_time(flow_cfg, step_index)
    tau = t * np.float32(o)
    if xp is np:
        from die_tpu.core.rng import np_fold_in, np_key
        from die_tpu.ops.perlin import lattice_gradients_np

        k = int(np.floor(tau))
        frac = np.float32(tau - np.float32(k))
        base = np_key(flow_cfg.seed)
        p0 = perlin_field(lattice_gradients_np(np_fold_in(base, k), o),
                          size_wh, o)
        p1 = perlin_field(lattice_gradients_np(np_fold_in(base, k + 1), o),
                          size_wh, o)
        u = _fade_scalar(frac)
        return p0 + u * (p1 - p0)

    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.ops.perlin import lattice_gradients_jax

    kf = xp.floor(tau)
    k = kf.astype(jnp.int32)
    frac = tau - kf
    base = jr.PRNGKey(flow_cfg.seed)
    p0 = perlin_field(lattice_gradients_jax(jr.fold_in(base, k), o),
                      size_wh, o)
    p1 = perlin_field(lattice_gradients_jax(jr.fold_in(base, k + 1), o),
                      size_wh, o)
    u = _fade_scalar(frac)
    return p0 + u * (p1 - p0)
