"""Localize the wave-flow on-TPU divergence found by tools/tpu_parity.py
(round 4): compare jitted subexpressions of the wave path vs the NumPy
oracle, bit for bit, on whatever backend jax selects.

Run:  python tools/probe_wave.py [--cpu]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def monotonic_int(a):
    bits = np.asarray(a, np.float32).view(np.uint32).astype(np.int64)
    neg = bits >= 0x80000000
    return np.where(neg, 0x80000000 - bits, bits)


def ulp(a, b):
    return int(np.abs(monotonic_int(a) - monotonic_int(b)).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from die_tpu.core.mathx import PI, sincos, sqrt
    from die_tpu.ops.waves import _iota2d_f32, flow_time, wave_field
    from die_tpu.core.config import FlowConfig

    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    W, H = 64, 128
    cfg = FlowConfig(kind="wave", scale=0.05, decay=0.1)

    # numpy twins
    t_np = flow_time(cfg, np.int32(0))
    two, one = np.float32(2.0), np.float32(1.0)
    xs_h = _iota2d_f32(np, (1, H), 1) * np.float32(1.0 / (H - 1))
    ys_w = _iota2d_f32(np, (W, 1), 0) * np.float32(1.0 / (W - 1))
    x_np = xs_h * two - one
    y_np = ys_w * two - one
    r_np = sqrt(x_np * x_np + y_np * y_np)
    sinx_np, cosx_np = sincos(PI * x_np)
    f_np = wave_field((W, H), t_np)

    def dev(fn, *a):
        return np.asarray(jax.jit(fn)(*a))

    t_dev = dev(lambda z: flow_time(cfg, z), jnp.int32(0))
    print("flow_time ulp:", ulp(t_dev, t_np), flush=True)

    x_dev = dev(lambda _: (_iota2d_f32(jnp, (1, H), 1)
                           * np.float32(1.0 / (H - 1))) * two - one,
                jnp.float32(0))
    print("x grid ulp:", ulp(np.broadcast_to(x_dev, (1, H)), x_np), flush=True)

    r_dev = dev(lambda _: sqrt(
        ((_iota2d_f32(jnp, (1, H), 1) * np.float32(1.0 / (H - 1)))
         * two - one) ** 2
        + ((_iota2d_f32(jnp, (W, 1), 0) * np.float32(1.0 / (W - 1)))
           * two - one) ** 2), jnp.float32(0))
    # NOTE: ** 2 may differ from x*x under algsimp; recompute np the same way
    r2_np = sqrt(x_np ** 2 + y_np ** 2)
    print("r ulp (pow form):", ulp(r_dev, r2_np), flush=True)

    sc_dev = dev(lambda z: sincos(PI * (z * two - one))[0],
                 jnp.asarray(xs_h))
    print("sincos ulp:", ulp(sc_dev, sinx_np), flush=True)

    f_dev = dev(lambda z: wave_field((W, H), z), jnp.asarray(t_np))
    print("wave_field ulp:", ulp(f_dev, f_np), flush=True)

    # the apply expression
    food_np = np.linspace(0, 2, W * H, dtype=np.float32).reshape(W, H)
    app_np = (np.float32(cfg.scale) * f_np
              + (one - np.float32(cfg.decay)) * food_np)
    app_dev = dev(lambda f, fd: (np.float32(cfg.scale) * f
                                 + (one - np.float32(cfg.decay)) * fd),
                  jnp.asarray(f_np), jnp.asarray(food_np))
    print("apply ulp:", ulp(app_dev, app_np), flush=True)


if __name__ == "__main__":
    main()
