#!/usr/bin/env python
"""Headline benchmark: env-steps/s/chip at 256x256 Physarum, 1024 lockstep envs.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 1e6 (the BASELINE.md target: >=1M env-steps/s/chip).

Config via env vars:
  BENCH_ENGINE (default fast)  'fast' = field-centric lattice engine (the
                               production path); 'exact' = reference-
                               semantics flat-agent engine
  BENCH_ENVS   (default 1024)  number of lockstep envs
  BENCH_FIELD  (default 256)   square field size
  BENCH_AGENTS (default 65536) agent slots per env (exact engine)
  BENCH_STEPS  (default 256)   steps per timed scan (fast engine: also the
                               K-step kernel fusion depth)
  BENCH_REPS   (default 3)     timed repetitions (best taken)
  BENCH_PALLAS_GATHER (default 0)  1 = route the exact engine's gathers
                               through the fused Pallas kernel (bit-identical)
Runs on whatever backend jax selects (the real TPU chip under axon).
"""
import json
import os
import sys
import time

import numpy as np


def _null_offset(reps=5):
    """Fixed per-call tunnel cost (dispatch + scalar-sync round trip,
    ~24-30 ms under axon — docs/PERF.md 'round 2 correction').  Subtracted
    from timed runs so the metric reports device throughput; at the
    headline config the correction is ~1.5%."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    float(np.asarray(f(x)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_fast():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.rollout import fast_rollout, fast_rollout_auto

    B = int(os.environ.get("BENCH_ENVS", 1024))
    F = int(os.environ.get("BENCH_FIELD", 256))
    T = int(os.environ.get("BENCH_STEPS", 256))
    REPS = int(os.environ.get("BENCH_REPS", 3))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") != "0"
    n_dirs = int(os.environ.get("BENCH_DIRS", 8))

    # BENCH_DIRS=16 measures the tuned 16-direction operating point (the
    # most reference-faithful lattice, BASELINE.md) — side metric, not the
    # headline
    if n_dirs == 8:
        dyn = FastDynamics()
    else:
        from die_tpu.fast.config import tuned_dynamics

        dyn = tuned_dynamics(n_dirs)

    def make(b):
        keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(b))
        states = jax.jit(jax.vmap(
            lambda k: fast_init_jax(k, (F, F), dyn)))(keys)
        rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(b))
        return states, rkeys

    @jax.jit
    def run(states, rkeys):
        # auto-routes: whole-field K-step kernel <=256^2, banded kernel for
        # larger pow2 fields, XLA scan otherwise (die_tpu/fast/rollout.py)
        if not use_pallas:
            roll = lambda s, k: fast_rollout(dyn, s, k, T)  # noqa: E731
        else:
            roll = lambda s, k: fast_rollout_auto(  # noqa: E731
                dyn, s, k, T, num_inner=T)
        _, rew, _ = jax.vmap(roll)(states, rkeys)
        return jnp.sum(rew)

    off = _null_offset()
    b = B
    while True:
        try:
            states, rkeys = make(b)
            float(np.asarray(run(states, rkeys)))
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(np.asarray(run(states, rkeys)))
                best = min(best, time.perf_counter() - t0)
            break
        except Exception as e:
            if b > 64 and ("RESOURCE_EXHAUSTED" in str(e)
                           or "memory" in str(e).lower()):
                print(f"bench: {b} envs OOM, retrying {b//2}", file=sys.stderr)
                b //= 2
                continue
            raise

    v = b * T / max(best - off, 1e-9)
    tag = "" if n_dirs == 8 else f", {n_dirs}-dir tuned"
    print(json.dumps({
        "metric": f"env-steps/s/chip, {F}x{F} lattice Physarum, {b} lockstep"
                  f" envs (fast engine{tag})",
        "value": round(v, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(v / 1_000_000, 4),
    }))



try:
    from die_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

def main():
    if os.environ.get("BENCH_ENGINE", "fast") == "fast":
        bench_fast()
        return
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core import channels as ch
    from die_tpu.core.config import Dynamics
    from die_tpu.core.init import init_env_state
    from die_tpu.models.gradient import PhysarumPolicy
    from die_tpu.parallel.rollout import rollout

    B = int(os.environ.get("BENCH_ENVS", 1024))
    F = int(os.environ.get("BENCH_FIELD", 256))
    N = int(os.environ.get("BENCH_AGENTS", 65536))
    T = int(os.environ.get("BENCH_STEPS", 32))
    REPS = int(os.environ.get("BENCH_REPS", 3))
    if os.environ.get("BENCH_PALLAS_GATHER", "0") == "1":
        # route the exact engine's hot gathers through the fused Pallas
        # kernel (bit-identical; measured A/B in docs/PERF.md round 4)
        from die_tpu.ops.pallas_gather import use_pallas_gather

        use_pallas_gather(True)

    dyn = Dynamics(init_agent_ratio=0.15)
    policy = PhysarumPolicy(max_agents=N, scale=0.007, turn_angle=30,
                            sense_offset=0.04)

    master = jr.PRNGKey(0)

    def make_batch(b):
        env_keys = jax.vmap(lambda i: jr.fold_in(
            jr.fold_in(master, ch.TAG_SESSION_ENV_INIT), i))(jnp.arange(b))
        pol_keys = jax.vmap(lambda i: jr.fold_in(
            jr.fold_in(master, ch.TAG_SESSION_POLICY_INIT), i))(jnp.arange(b))
        roll_keys = jax.vmap(lambda i: jr.fold_in(
            jr.fold_in(master, ch.TAG_SESSION_ROLLOUT), i))(jnp.arange(b))
        states = jax.jit(jax.vmap(
            lambda k: init_env_state(k, (F, F), dyn, N)))(env_keys)
        pstates = jax.jit(jax.vmap(policy.init_state))(pol_keys)
        return states, pstates, roll_keys

    from functools import partial

    fn = partial(rollout, dyn, policy)

    # NOTE: the run returns a single on-device scalar and timing syncs on its
    # host transfer — under the axon tunnel jax.block_until_ready does not
    # reliably block, and pulling bulk arrays would time the tunnel instead
    # of the chip.
    def _run(s, p, k):
        res = jax.vmap(fn, in_axes=(None, 0, 0, 0, None, None))(
            None, s, p, k, T, 0)
        return jnp.sum(res.rewards)

    run = jax.jit(_run)

    off = _null_offset()
    b = B
    while True:
        try:
            states, pstates, keys = make_batch(b)
            float(np.asarray(run(states, pstates, keys)))  # compile + warmup
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = float(np.asarray(run(states, pstates, keys)))
                best = min(best, time.perf_counter() - t0)
            break
        except Exception as e:  # OOM backoff
            if b > 64 and ("RESOURCE_EXHAUSTED" in str(e) or "memory"
                           in str(e).lower()):
                print(f"bench: {b} envs OOM, retrying with {b//2}",
                      file=sys.stderr)
                b //= 2
                continue
            raise

    env_steps_per_s = b * T / max(best - off, 1e-9)
    print(json.dumps({
        "metric": f"env-steps/s/chip, {F}x{F} Physarum, {b} lockstep envs,"
                  f" {N} agent slots",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
