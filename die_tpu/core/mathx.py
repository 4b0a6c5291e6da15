"""Backend-generic fp32 math kernels shared by the TPU engine and NumPy oracle.

Why this module exists: the reference's agent math leans on libm transcendentals
(``np.exp``/``np.angle``/``np.sin``-family via polar helpers, core/utils.py:154-188;
Gaussian noise via ``default_rng().normal``, core/agent/gradient.py:50-53), whose
bit patterns differ between NumPy's libm and XLA's lowering.  To make fp32
trajectories *bit-for-bit* comparable between the seeded NumPy oracle and the
compiled TPU engine, every transcendental used by the simulation is implemented
here from IEEE-exact primitives only (+, -, *, /, sqrt, floor, comparisons,
bit casts) with identical operation order on both backends.  The polynomial
kernels are standard single-precision minimax fits (cephes-style sinf/cosf/
atanf/logf; Giles 2010 for erfinv).

Every function accepts either ``np.ndarray`` or ``jax.Array``/tracer inputs and
dispatches on type; fp32 in, fp32 out.
"""
from __future__ import annotations

import numpy as np

try:  # The oracle can run without jax; dispatch degrades to numpy-only.
    import jax as _jax
    import jax.numpy as _jnp

    def _is_jax(x) -> bool:
        return isinstance(x, (_jax.Array, _jax.core.Tracer))
except Exception:  # pragma: no cover
    _jax = None
    _jnp = None

    def _is_jax(x) -> bool:
        return False

__all__ = [
    "xp_of", "f32", "floor", "where", "recip", "div", "rsqrt", "sqrt",
    "sin", "cos", "sincos", "atan2",
    "log1m_sq", "erfinv", "normal_from_uniform", "exp", "tanh",
    "renormalize_radians",
    "discretize", "round3", "wrap01", "tree_sum", "polar2xy", "xy2polar_angle",
    "hypot2", "PI", "TWO_PI",
]

PI = np.float32(np.pi)
TWO_PI = np.float32(2 * np.pi)


# ---------------------------------------------------------------------------
# Division and square root.
#
# Empirical finding on this stack (jax 0.9 / XLA:CPU): fp32 ``div`` and
# ``sqrt`` are NOT bitwise-identical to NumPy's IEEE results (mul/add/floor/
# bitcast are).  Since the whole bit-exactness strategy rests on both backends
# executing identical exact primitives, the contract defines its own division
# and sqrt as Newton–Raphson refinements of bit-hack seeds — multiply/add
# only, hence bitwise reproducible on NumPy, XLA:CPU and XLA:TPU alike.
# Accuracy ~1 ulp after three iterations over the simulation's value ranges.
# ---------------------------------------------------------------------------

_RECIP_MAGIC = np.int32(0x7EF311C3)
_RSQRT_MAGIC = np.int32(0x5F3759DF)


def recip(y):
    """1/y for finite nonzero y (arithmetic-only Newton reciprocal)."""
    xp = xp_of(y)
    ay = xp.abs(y)
    i = _bitcast_f32_to_i32(ay)
    r = _bitcast_i32_to_f32(_RECIP_MAGIC - i)
    two = np.float32(2.0)
    r = r * (two - ay * r)
    r = r * (two - ay * r)
    r = r * (two - ay * r)
    return xp.where(y < np.float32(0.0), -r, r)


def div(x, y):
    """x/y via the contract reciprocal."""
    return x * recip(y)


def rsqrt(x):
    """1/sqrt(x) for x > 0 (arithmetic-only Newton rsqrt)."""
    i = _bitcast_f32_to_i32(x)
    r = _bitcast_i32_to_f32(_RSQRT_MAGIC - (i >> 1))
    half = np.float32(0.5)
    three_half = np.float32(1.5)
    for _ in range(3):
        r = r * (three_half - half * x * r * r)
    return r


def sqrt(x):
    """sqrt(x) for x >= 0; sqrt(0) = 0 exactly."""
    xp = xp_of(x)
    pos = x > np.float32(0.0)
    safe = xp.where(pos, x, np.float32(1.0))
    return xp.where(pos, safe * rsqrt(safe), np.float32(0.0))


def xp_of(*arrays):
    """Return the array namespace (numpy or jax.numpy) for the given arrays."""
    if _jnp is not None and any(_is_jax(a) for a in arrays):
        return _jnp
    return np


_PALLAS_TRACE = False


def set_pallas_trace(on: bool) -> bool:
    """Mark that tracing is happening inside a Pallas TPU kernel (set by the
    kernel bodies in fast/pallas_step.py; trace-time only).  Returns the
    previous value so callers can restore it."""
    global _PALLAS_TRACE
    prev = _PALLAS_TRACE
    _PALLAS_TRACE = bool(on)
    return prev


def pallas_trace_active() -> bool:
    """Whether tracing is currently inside a Pallas TPU kernel."""
    return _PALLAS_TRACE


def order_barrier(*vals):
    """Pin the evaluation boundary between arithmetic stages.

    XLA's algebraic simplifier reorders value-changing float patterns when
    whole expressions fuse (measured: wave_field diverges by up to 3584 ulp
    on TPU and on CPU-without-pinned-flags, while every isolated stage is
    bit-exact — docs/PARITY.md round 4).  ``lax.optimization_barrier``
    around stage results stops cross-stage rewrites without changing any
    arithmetic.  Identity on the numpy backend (the oracle is the order
    spec) and inside Pallas kernels (Mosaic runs no HLO simplification).

    Returns a single value when given one argument, else a tuple.
    """
    xp = xp_of(*vals)
    if xp is np or pallas_trace_active():
        return vals[0] if len(vals) == 1 else vals
    import jax

    out = jax.lax.optimization_barrier(vals)
    return out[0] if len(vals) == 1 else out


_PALLAS_DYNLOOP = False


def set_pallas_dynloop(on: bool) -> bool:
    """Mark that the current Pallas kernel wants the 16-direction phases as
    fori_loops (the whole-field kernels, where unrolled roll buffers
    overflow VMEM at 256² — fast/env.py).  The banded kernel keeps the
    unrolled static rolls (its blocks fit, and static rolls are faster).
    Returns the previous value."""
    global _PALLAS_DYNLOOP
    prev = _PALLAS_DYNLOOP
    _PALLAS_DYNLOOP = bool(on)
    return prev


def pallas_dynloop_active() -> bool:
    return _PALLAS_DYNLOOP


def xroll(xp, a, shift: int, axis: int):
    """``xp.roll`` with the Mosaic-native rotate inside Pallas kernels.

    jnp.roll lowers to slice+concatenate, which costs ~44 ns per 256x256
    traversal in-kernel on v5e; pltpu.roll lowers to the hardware rotate
    (~8 ns).  Identical results (verified bitwise vs jnp.roll in interpret
    mode and asserted by the kernel-vs-XLA parity tests)."""
    if _PALLAS_TRACE and xp is not np:
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.roll(a, shift % a.shape[axis], axis)
    return xp.roll(a, shift, axis)


def f32(x):
    return np.float32(x)


def floor(x):
    return xp_of(x).floor(x)


def where(c, a, b):
    return xp_of(c, a, b).where(c, a, b)


def _bitcast_f32_to_i32(x):
    if _is_jax(x):
        return _jax.lax.bitcast_convert_type(x, _jnp.int32)
    return np.ascontiguousarray(np.asarray(x, np.float32)).view(np.int32)


def _bitcast_i32_to_f32(x):
    if _is_jax(x):
        return _jax.lax.bitcast_convert_type(x, _jnp.float32)
    return np.ascontiguousarray(np.asarray(x, np.int32)).view(np.float32)


# ---------------------------------------------------------------------------
# sin / cos — cephes sinf/cosf style with 2-part Cody-Waite range reduction.
# Valid (to ~1 ulp of fp32) for |theta| up to ~1e4, far beyond the simulation's
# (-2*pi, 2*pi] working range.
# ---------------------------------------------------------------------------

_INV_PIO2 = np.float32(0.636619772367581343)  # 2/pi
_PIO2_HI = np.float32(1.5707855224609375)     # top bits of pi/2
_PIO2_LO = np.float32(1.0804334124e-05)       # pi/2 - _PIO2_HI (fp32)

_SIN_C1 = np.float32(-1.6666654611e-1)
_SIN_C2 = np.float32(8.3321608736e-3)
_SIN_C3 = np.float32(-1.9515295891e-4)
_COS_C1 = np.float32(4.166664568298827e-2)
_COS_C2 = np.float32(-1.388731625493765e-3)
_COS_C3 = np.float32(2.443315711809948e-5)


def _sin_poly(r, r2):
    return r + r * r2 * (_SIN_C1 + r2 * (_SIN_C2 + r2 * _SIN_C3))


def _cos_poly(r2):
    one = np.float32(1.0)
    half = np.float32(0.5)
    return one - half * r2 + r2 * r2 * (_COS_C1 + r2 * (_COS_C2 + r2 * _COS_C3))


def sincos(theta):
    """Simultaneous (sin, cos) with a shared quadrant reduction."""
    xp = xp_of(theta)
    half = np.float32(0.5)
    k = xp.floor(theta * _INV_PIO2 + half)
    r = theta - k * _PIO2_HI
    r = r - k * _PIO2_LO
    # quadrant q = k mod 4, computed in fp (exact for |k| < 2**23)
    q = k - np.float32(4.0) * xp.floor(k * np.float32(0.25))
    r2 = r * r
    s = _sin_poly(r, r2)
    c = _cos_poly(r2)
    q0 = q == np.float32(0.0)
    q1 = q == np.float32(1.0)
    q2 = q == np.float32(2.0)
    sin_v = xp.where(q0, s, xp.where(q1, c, xp.where(q2, -s, -c)))
    cos_v = xp.where(q0, c, xp.where(q1, -s, xp.where(q2, -c, s)))
    return sin_v, cos_v


def sin(theta):
    return sincos(theta)[0]


def cos(theta):
    return sincos(theta)[1]


# ---------------------------------------------------------------------------
# atan2 — cephes atanf polynomial on [0, tan(pi/8)] with octant folding.
# Edge semantics: atan2(0, 0) = 0; atan2(0, x<0) = +pi (the oracle contract
# does not distinguish -0.0 inputs).
# ---------------------------------------------------------------------------

_TAN_PIO8 = np.float32(0.4142135623730950)
_PIO4 = np.float32(0.7853981633974483)
_PIO2 = np.float32(1.5707963267948966)
_ATAN_C1 = np.float32(-3.33329491539e-1)
_ATAN_C2 = np.float32(1.99777106478e-1)
_ATAN_C3 = np.float32(-1.38776856032e-1)
_ATAN_C4 = np.float32(8.05374449538e-2)


def _atan_unit(t):
    """atan(t) for t in [0, 1]."""
    xp = xp_of(t)
    one = np.float32(1.0)
    big = t > _TAN_PIO8
    # reduced argument u = (t-1)/(t+1) for the upper range, else t
    u = xp.where(big, div(t - one, t + one), t)
    u2 = u * u
    p = u + u * u2 * (_ATAN_C1 + u2 * (_ATAN_C2 + u2 * (_ATAN_C3 + u2 * _ATAN_C4)))
    return xp.where(big, _PIO4 + p, p)


def atan2(y, x):
    xp = xp_of(y, x)
    zero = np.float32(0.0)
    ax = xp.abs(x)
    ay = xp.abs(y)
    mx = xp.maximum(ax, ay)
    mn = xp.minimum(ax, ay)
    t = xp.where(mx > zero, mn * recip(xp.where(mx > zero, mx, np.float32(1.0))),
                 zero)
    a = _atan_unit(t)
    a = xp.where(ay > ax, _PIO2 - a, a)
    a = xp.where(x < zero, PI - a, a)
    return xp.where(y < zero, -a, a)


# ---------------------------------------------------------------------------
# log(1 - x*x) for |x| < 1 — used by the erfinv-based normal transform.
# Built on a cephes-style logf evaluated via exponent/mantissa bit extraction.
# ---------------------------------------------------------------------------

_LOG_P = tuple(np.float32(c) for c in (
    7.0376836292e-2, -1.1514610310e-1, 1.1676998740e-1, -1.2420140846e-1,
    1.4249322787e-1, -1.6668057665e-1, 2.0000714765e-1, -2.4999993993e-1,
    3.3333331174e-1,
))
_SQRTHF = np.float32(0.70710678118654752440)
_LN2_LO = np.float32(-2.12194440e-4)
_LN2_HI = np.float32(0.693359375)


def _log_f32(x):
    """Natural log for fp32 x > 0 (finite, normal); arithmetic+bitcast only."""
    xp = xp_of(x)
    bits = _bitcast_f32_to_i32(x)
    e = (bits >> 23) - 127
    m_bits = (bits & 0x7FFFFF) | 0x3F800000
    m = _bitcast_i32_to_f32(m_bits)  # in [1, 2)
    e = e.astype(np.int32) if xp is np else e
    ef = e.astype(np.float32)
    one = np.float32(1.0)
    # fold m into [sqrt(1/2), sqrt(2))
    small = m < (_SQRTHF * np.float32(2.0))
    # cephes: if mantissa (in [0.5,1)) < SQRTHF: e -= 1; x = 2x - 1 else x = x - 1
    # Our m is in [1,2): m/2 in [0.5,1).  m/2 < SQRTHF <=> m < 2*SQRTHF.
    f = xp.where(small, m - one, np.float32(0.5) * m - one)
    ef = xp.where(small, ef, ef + one)
    z = f * f
    y = _LOG_P[0]
    for c in _LOG_P[1:]:
        y = y * f + c
    y = y * f * z
    y = y + ef * _LN2_LO
    y = y - np.float32(0.5) * z
    return f + y + ef * _LN2_HI


def log1m_sq(x):
    """log(1 - x*x) computed as log((1-x)*(1+x)), for |x| < 1."""
    one = np.float32(1.0)
    return _log_f32((one - x) * (one + x))


# ---------------------------------------------------------------------------
# erfinv — Giles (2010) single-precision rational approximation.
# ---------------------------------------------------------------------------

_GILES_A = tuple(np.float32(c) for c in (
    2.81022636e-08, 3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
    0.00021858087, -0.00125372503, -0.00417768164, 0.246640727, 1.50140941,
))
_GILES_B = tuple(np.float32(c) for c in (
    -0.000200214257, 0.000100950558, 0.00134934322, -0.00367342844,
    0.00573950773, -0.0076224613, 0.00943887047, 1.00167406, 2.83297682,
))


def erfinv(x):
    """Inverse error function for |x| < 1 (fp32)."""
    xp = xp_of(x)
    w = -log1m_sq(x)
    small = w < np.float32(5.0)
    # central branch
    wc = w - np.float32(2.5)
    pa = _GILES_A[0]
    for c in _GILES_A[1:]:
        pa = pa * wc + c
    # tail branch; clamp sqrt arg to avoid nan where the branch is unused
    wt = sqrt(xp.where(small, np.float32(25.0), w)) - np.float32(3.0)
    pb = _GILES_B[0]
    for c in _GILES_B[1:]:
        pb = pb * wt + c
    return xp.where(small, pa, pb) * x


_SQRT2 = np.float32(1.4142135623730951)


def normal_from_uniform(u):
    """Standard-normal deviates from uniforms in (0, 1): sqrt(2)*erfinv(2u-1).

    Part of the RNG contract: both the oracle and the TPU engine produce
    Gaussians through this transform, never via backend ``normal`` routines.
    """
    x = np.float32(2.0) * u - np.float32(1.0)
    return _SQRT2 * erfinv(x)


# ---------------------------------------------------------------------------
# exp / tanh — cephes expf; tanh built on it.  Used by the NCA model's final
# activation (reference nn.Tanh, core/agent/evo.py:97).
# ---------------------------------------------------------------------------

_LOG2E = np.float32(1.44269504088896341)
_EXP_C1 = np.float32(0.693359375)
_EXP_C2 = np.float32(-2.12194440e-4)
_EXP_P = tuple(np.float32(c) for c in (
    1.9875691500e-4, 1.3981999507e-3, 8.3334519073e-3,
    4.1665795894e-2, 1.6666665459e-1, 5.0000001201e-1,
))


def exp(x):
    """fp32 e**x for |x| <= 87 (clamped); arithmetic+bitcast only."""
    xp = xp_of(x)
    lim = np.float32(87.0)
    x = xp.clip(x, -lim, lim)
    z = xp.floor(_LOG2E * x + np.float32(0.5))
    r = x - z * _EXP_C1
    r = r - z * _EXP_C2
    zi = z.astype(np.int32)
    p = _EXP_P[0]
    for c in _EXP_P[1:]:
        p = p * r + c
    y = p * r * r + r + np.float32(1.0)
    # scale by 2**zi via exponent-bit construction
    scale = _bitcast_i32_to_f32((zi + 127) << 23)
    return y * scale


def tanh(x):
    """fp32 tanh via the shared exp: sign(x) * (1 - 2/(exp(2|x|) + 1))."""
    xp = xp_of(x)
    one = np.float32(1.0)
    two = np.float32(2.0)
    ax = xp.abs(x)
    t = one - two * recip(exp(two * ax) + one)
    return xp.where(x < np.float32(0.0), -t, t)


# ---------------------------------------------------------------------------
# small shared helpers mirroring core/utils.py semantics
# ---------------------------------------------------------------------------

def _fmod_floor(a, b, inv_b):
    """a mod b defined as a - floor(a * (1/b)) * b — the numpy sign-of-divisor
    rule with a precomputed fp32 reciprocal (see div/sqrt note above)."""
    xp = xp_of(a)
    q = xp.floor(a * inv_b)
    return a - q * b


_INV_NEG_TWO_PI = np.float32(1.0 / (-2.0 * np.pi))


def renormalize_radians(rads):
    """Renormalize radians into (-pi, pi] — core/utils.py:177-179 semantics:
    ``(rads - pi) % (-2*pi) + pi``."""
    return _fmod_floor(rads - PI, -TWO_PI, _INV_NEG_TWO_PI) + PI


def discretize(value, step):
    """``(value // step) * step`` — core/utils.py:182-183.  ``step`` must be a
    concrete fp32 scalar (its reciprocal is formed host-side)."""
    xp = xp_of(value)
    inv_step = np.float32(1.0 / float(step))
    return xp.floor(value * inv_step) * step


def round3(u):
    """Round to 3 decimals, half-up — the engine's pinned-down twin of the
    reference's pervasive ``.round(3)`` on random draws (core/data_init.py:168)."""
    xp = xp_of(u)
    return xp.floor(u * np.float32(1000.0) + np.float32(0.5)) * np.float32(0.001)


def wrap01(c):
    """Coordinate wrap ``c % 1.0`` (torus boundary, core/env.py:155)."""
    xp = xp_of(c)
    return c - xp.floor(c)


def polar2xy(r, theta):
    """(r, theta) -> (x, y) — core/utils.py:162-164 via the shared sincos."""
    s, c = sincos(theta)
    return r * c, r * s


def xy2polar_angle(x, y):
    """Angle of (x + iy) — ``np.angle`` twin (core/utils.py:167-174)."""
    return atan2(y, x)


def hypot2(x, y):
    """sqrt(x^2 + y^2) — the L2 norm used for action cost and gradient norms."""
    return sqrt(x * x + y * y)


def tree_sum(x):
    """Order-pinned fp32 sum: pairwise fold over a zero-padded pow2 length.

    Both backends fold in the same order, so reductions (reward, stats)
    compare bit-for-bit where a naive ``sum`` would not.
    """
    xp = xp_of(x)
    flat = xp.reshape(x, (-1,))
    n = flat.shape[0]
    pow2 = 1 if n == 0 else 1 << (int(n) - 1).bit_length()
    if pow2 != n:
        pad = xp.zeros((pow2 - n,), dtype=flat.dtype)
        flat = xp.concatenate([flat, pad])
    while pow2 > 1:
        pow2 //= 2
        flat = flat[:pow2] + flat[pow2:]
    return flat[0]
