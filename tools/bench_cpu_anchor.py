#!/usr/bin/env python
"""Round-5 CPU anchor (VERDICT r4 missing #3): measure a reference-class
CPU implementation of the same semantics, so the "beats the reference"
axis rests on a number instead of an inference.

The reference itself cannot run here (2023-era numpy pin, xarray /
perlin_noise absent, zero egress — verified round 4), but this repo's
eager NumPy oracles ARE reference-class implementations: the exact-engine
oracle is the bit-for-bit executable spec of the reference's float-
coordinate Physarum loop (vectorized numpy, same data layout and ops as
/root/reference/core/env.py:101-131), and the fast-engine oracle is the
eager NumPy statement of the lattice step.

Items (single process, forced CPU — safe next to a TPU session):
  exact_oracle_cfg2 — BASELINE config #2: Physarum(max_agents=65536,
      scale=0.007, turn_angle=30, sense_offset=0.04), 256^2, eager numpy
  fast_oracle_256   — the lattice step's eager NumPy oracle at the
      headline geometry (256^2, 8-dir defaults)
  fast_oracle_64    — same at the learning-protocol size (64^2)

Appends to tools/bench_cpu_anchor_log.jsonl; numbers go to BASELINE.md.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

LOG = "/root/repo/tools/bench_cpu_anchor_log.jsonl"


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the tunnel

    from die_tpu.core.config import Dynamics
    from die_tpu.core.rng import np_key
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_np
    from die_tpu.fast.rollout import oracle_fast_rollout
    from die_tpu.oracle.agents import OraclePhysarumAgent
    from die_tpu.oracle.env import oracle_init_state
    from die_tpu.oracle.rollout import oracle_rollout, oracle_session_keys

    # ---- exact-engine oracle at BASELINE config #2 ------------------------
    dyn = Dynamics(init_agent_ratio=0.15)
    size, n = (256, 256), 65536
    ke, kp, kr = oracle_session_keys(np_key(7))
    agent = OraclePhysarumAgent(max_agents=n, scale=0.007, turn_angle=30,
                                sense_offset=0.04)
    st = oracle_init_state(ke, size, dyn, n)
    agent.init_state(kp)
    st, _, _ = oracle_rollout(dyn, agent, st, kr, 2)  # warm caches
    steps = 10
    t0 = time.perf_counter()
    st, _, nums = oracle_rollout(dyn, agent, st, kr, steps, t0=2)
    dt = time.perf_counter() - t0
    log(item="exact_oracle_cfg2", steps=steps, secs=round(dt, 3),
        steps_per_s=round(steps / dt, 2), agents=int(nums[-1]))

    # ---- fast-engine oracle (eager numpy lattice step) --------------------
    for F, steps in ((256, 20), (64, 100)):
        fdyn = FastDynamics()
        fst = fast_init_np(np_key(3), (F, F), fdyn)
        fst, _, _ = oracle_fast_rollout(fdyn, fst, np_key(5), 2)
        t0 = time.perf_counter()
        fst, _, _ = oracle_fast_rollout(fdyn, fst, np_key(5), steps, t0=2)
        dt = time.perf_counter() - t0
        log(item=f"fast_oracle_{F}", steps=steps, secs=round(dt, 3),
            steps_per_s=round(steps / dt, 2))


if __name__ == "__main__":
    main()
