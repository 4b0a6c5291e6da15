"""Stage-by-stage bisect of the wave_field divergence: one jit returning
every intermediate, compared bitwise vs the numpy twin.  CPU with
--xla_cpu_max_isa=AVX reproduces the TPU profile (3584 ulp fused, stages
exact in isolation)."""
import sys

sys.path.insert(0, ".")

import numpy as np


def monotonic_int(a):
    bits = np.asarray(a, np.float32).view(np.uint32).astype(np.int64)
    neg = bits >= 0x80000000
    return np.where(neg, 0x80000000 - bits, bits)


def ulp(a, b):
    return int(np.abs(monotonic_int(a) - monotonic_int(b)).max())


def build(xp, t, W, H):
    from die_tpu.core.mathx import PI, sincos, sqrt, order_barrier
    from die_tpu.ops.waves import _iota2d_f32

    two, one = np.float32(2.0), np.float32(1.0)
    xs_h = _iota2d_f32(xp, (1, H), 1) * np.float32(1.0 / (H - 1))
    ys_w = _iota2d_f32(xp, (W, 1), 0) * np.float32(1.0 / (W - 1))
    x = xs_h * two - one
    y = ys_w * two - one
    x, y = order_barrier(x, y)
    r = sqrt(x * x + y * y)
    sin_x, cos_x = sincos(order_barrier(PI * x))
    sin_04y, _ = sincos(order_barrier(np.float32(0.4) * PI * y))
    r, cos_x, sin_04y = order_barrier(r, cos_x, sin_04y)
    rwave = r + cos_x + sin_04y
    arg_w = order_barrier(PI * (rwave + t))
    _, z_waves = sincos(arg_w)
    s3 = np.float32(3.0)
    arg_ix = order_barrier(PI * x * s3 + t)
    arg_iy = order_barrier(PI * y * s3 + t)
    sin_ix, _ = sincos(arg_ix)
    _, cos_iy = sincos(arg_iy)
    z_waves, sin_ix, cos_iy = order_barrier(z_waves, sin_ix, cos_iy)
    z_islands = sin_ix + cos_iy
    mix = np.float32(0.25)
    out = (one - mix) * z_waves + mix * z_islands
    return dict(x=xp.broadcast_to(x, (W, H)), y=xp.broadcast_to(y, (W, H)),
                r=r, cos_x=xp.broadcast_to(cos_x, (W, H)),
                sin_04y=xp.broadcast_to(sin_04y, (W, H)), rwave=rwave,
                arg_w=arg_w, z_waves=z_waves,
                arg_ix=xp.broadcast_to(arg_ix, (W, H)),
                sin_ix=xp.broadcast_to(sin_ix, (W, H)),
                cos_iy=xp.broadcast_to(cos_iy, (W, H)),
                z_islands=z_islands, out=out)


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    W, H = 64, 128
    t = np.float32(0.0)
    ref = build(np, t, W, H)
    dev = jax.jit(lambda tt: build(jnp, tt, W, H))(jnp.float32(t))
    for k in ref:
        print(f"{k:10s} ulp {ulp(np.asarray(dev[k]), ref[k])}", flush=True)


if __name__ == "__main__":
    main()
