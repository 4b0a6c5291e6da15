"""Circular-padded 2D convolution as a pinned-order roll/FMA chain.

Twin of ``nn.Conv2d(padding='same', padding_mode='circular', bias=False)``
(core/agent/evo.py:82-93) for the Neural-CA perception model.  Written as an
explicit tap accumulation (cross-correlation, ascending (out, in, du, dv)
order) so the NumPy oracle and the compiled engine agree bit-for-bit — an
``lax.conv`` lowering would not pin the accumulation order.

For the small kernels the NCA uses (3x3 over 3 channels) XLA fuses this into
one elementwise pass; a Pallas/MXU path can replace it where bitwise parity
is not required.
"""
from __future__ import annotations

import numpy as np

from die_tpu.core.mathx import xp_of


def circular_conv(field, kernel):
    """field: f32[C_in, W, H]; kernel: f32[C_out, C_in, k, k] -> [C_out, W, H].

    out[o, x, y] = sum_i sum_du sum_dv K[o,i,du,dv] * field[i, x+du-r, y+dv-r]
    with circular (wrap) indexing; accumulation order pinned ascending.
    """
    xp = xp_of(field, kernel)
    c_out, c_in, k, _ = kernel.shape
    r = k // 2
    outs = []
    for o in range(c_out):
        acc = None
        for i in range(c_in):
            for du in range(k):
                for dv in range(k):
                    shifted = xp.roll(field[i], (r - du, r - dv), axis=(0, 1))
                    term = kernel[o, i, du, dv] * shifted
                    acc = term if acc is None else acc + term
        outs.append(acc)
    return xp.stack(outs)


def xavier_uniform_bound(c_in: int, c_out: int, k: int) -> np.float32:
    """torch ``xavier_uniform`` bound sqrt(6/(fan_in+fan_out)) with
    fan = channels * k*k (torch.nn.init semantics for conv weights)."""
    fan_in = c_in * k * k
    fan_out = c_out * k * k
    return np.float32(float(np.sqrt(6.0 / (fan_in + fan_out))))
