"""Regression: wave_field stays bitwise vs the numpy oracle under XLA's
DEFAULT simplification (algsimp ENABLED).

Round-4 real-chip finding (docs/PARITY.md): with the whole wave formula
fused, the algebraic simplifier reassociates constant chains
((PI*x)*s3 -> x*(PI*s3), and (PI*x)*INV_PIO2 inside the sincos range
reduction), diverging by up to 3584 ulp on TPU — while every isolated
stage is bit-exact.  ops/waves.py now pins stage boundaries with
``mathx.order_barrier``; this test reproduces the failing profile (CPU
with FMA contraction off but algsimp ON — the transform mix measured to
match the TPU backend) in a subprocess, since the suite's conftest pins
algsimp off for everything in-process.
"""
import json
import os
import subprocess
import sys

_SCRIPT = r"""
import json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from die_tpu.ops.waves import wave_field

f_np = wave_field((64, 128), np.float32(0.37))
f_dev = np.asarray(jax.jit(lambda t: wave_field((64, 128), t))(
    jnp.float32(0.37)))
print(json.dumps({
    "equal": bool((f_np.view(np.uint32) == f_dev.view(np.uint32)).all()),
}))
"""


def test_wave_field_bitwise_with_algsimp_enabled():
    env = dict(os.environ)
    # FMA contraction off (TPU does not contract — measured, docs/PARITY.md
    # round 4); algsimp left ON, the configuration that exposed the bug.
    env["XLA_FLAGS"] = "--xla_cpu_max_isa=AVX"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", _SCRIPT],
                         capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))), timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["equal"], "wave_field diverges under default algsimp"
