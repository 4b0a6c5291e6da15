#!/usr/bin/env python
"""Count full-field vector passes in one fast_step trace.

Traces the step body (jnp backend) and tallies jaxpr equations whose output
is field-sized, grouped by primitive — the ground-truth ledger for the
pass-reduction work in docs/PERF.md ("Where the remaining 8x lives").
Pure CPU tracing; no TPU needed.
"""
import os
import sys
from collections import Counter

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits, fast_step


def count(dyn, W=256, H=256, label=""):
    state = FastEnvState(
        occ=jnp.zeros((W, H), jnp.float32),
        dir=jnp.zeros((W, H), jnp.float32),
        agent_food=jnp.zeros((W, H), jnp.float32),
        env_food=jnp.zeros((W, H), jnp.float32),
        chem=jnp.zeros((W, H), jnp.float32),
        flow_step=jnp.int32(0),
    )
    bits = FastStepBits(
        rand=jnp.zeros((W, H), jnp.uint32),
        prio_rot=None if dyn.per_cell_priority else jnp.uint32(0),
    )
    jaxpr = jax.make_jaxpr(lambda s, b: fast_step(dyn, s, b))(state, bits)
    per_prim = Counter()
    total = 0
    fsize = W * H
    for eqn in jaxpr.jaxpr.eqns:
        for ov in eqn.outvars:
            if hasattr(ov.aval, "size") and ov.aval.size >= fsize // 2:
                per_prim[eqn.primitive.name] += 1
                total += 1
    print(f"== {label or dyn!r}: {total} field-sized eqns ==")
    for name, n in per_prim.most_common():
        print(f"  {name:24s} {n}")
    return total


if __name__ == "__main__":
    count(FastDynamics(), label="default (8-dir, per-cell prio, murmur off-trace)")
    count(FastDynamics(per_cell_priority=False), label="per-step prio")
    count(FastDynamics(num_dirs=4), label="4-dir")
    count(FastDynamics(num_dirs=4, per_cell_priority=False),
          label="4-dir + per-step prio")
