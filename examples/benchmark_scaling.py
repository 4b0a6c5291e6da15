"""Scaling-efficiency harness — the measurement tool behind BASELINE.md's
>=85% chip->host->multi-host target.

Two measurements:
  * batch scaling on the current backend: env-steps/s at B and 2B (a chip
    with headroom should scale ~linearly until compute-bound);
  * mesh scaling: env-steps/s on 1 device vs all devices of the mesh with
    env-sharded batches (on CPU set XLA_FLAGS=--xla_force_host_platform_device_count=8
    JAX_PLATFORMS=cpu to simulate; on a pod run one process per host after
    die_tpu.parallel.distributed.initialize()).
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.rollout import fast_rollout
from die_tpu.parallel.mesh import env_mesh, shard_env_batch


def measure(dyn, field, B, T, mesh=None, reps=3, annotate_name=None):
    from die_tpu.utils.profiling import annotate
    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(
        lambda k: fast_init_jax(k, (field, field), dyn)))(keys)
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))
    if mesh is not None:
        states = shard_env_batch(mesh, states)
        rkeys = shard_env_batch(mesh, rkeys)

    @jax.jit
    def run(states, rkeys):
        _, rew, _ = jax.vmap(lambda s, k: fast_rollout(dyn, s, k, T))(
            states, rkeys)
        return jnp.sum(rew)

    float(np.asarray(run(states, rkeys)))
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        if annotate_name:  # host-side trace region per rollout chunk
            with annotate(f"{annotate_name}/chunk{i}"):
                float(np.asarray(run(states, rkeys)))
        else:
            float(np.asarray(run(states, rkeys)))
        best = min(best, time.perf_counter() - t0)
    return B * T / best


def measure_exact(field, B, T, reps=1, annotate_name=None):
    """Exact-engine rollout (flat-agent Physarum) — traced runs show the
    six substeps as ``die/*`` named XLA scopes (core/env.py)."""
    from functools import partial

    from die_tpu.core import channels as ch
    from die_tpu.core.config import Dynamics
    from die_tpu.core.init import init_env_state
    from die_tpu.models.gradient import PhysarumPolicy
    from die_tpu.parallel.rollout import rollout
    from die_tpu.utils.profiling import annotate

    dyn = Dynamics(init_agent_ratio=0.15)
    n = max(256, field * field // 4)
    policy = PhysarumPolicy(max_agents=n, scale=0.007, turn_angle=30,
                            sense_offset=0.04)
    master = jr.PRNGKey(0)
    ek = jax.vmap(lambda i: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_ENV_INIT), i))(jnp.arange(B))
    pk = jax.vmap(lambda i: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_POLICY_INIT), i))(jnp.arange(B))
    rk = jax.vmap(lambda i: jr.fold_in(
        jr.fold_in(master, ch.TAG_SESSION_ROLLOUT), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(
        lambda k: init_env_state(k, (field, field), dyn, n)))(ek)
    pstates = jax.jit(jax.vmap(policy.init_state))(pk)
    fn = partial(rollout, dyn, policy)

    @jax.jit
    def run(s, p, k):
        res = jax.vmap(fn, in_axes=(None, 0, 0, 0, None, None))(
            None, s, p, k, T, 0)
        return jnp.sum(res.rewards)

    float(np.asarray(run(states, pstates, rk)))
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        if annotate_name:
            with annotate(f"{annotate_name}/chunk{i}"):
                float(np.asarray(run(states, pstates, rk)))
        else:
            float(np.asarray(run(states, pstates, rk)))
        best = min(best, time.perf_counter() - t0)
    return B * T / best



try:
    from die_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--field", type=int, default=128)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "alone is captured too early — jax is partially "
                         "pre-imported at interpreter startup)")
    ap.add_argument("--trace", metavar="LOGDIR", default=None,
                    help="capture a TensorBoard trace of the batch-scaling "
                         "measurement into LOGDIR (utils/profiling.trace; "
                         "rollout chunks appear as host annotations, the "
                         "six exact-engine substeps as die/* named scopes "
                         "when profiling the exact engine)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dyn = FastDynamics()
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].device_kind}")

    if args.trace:
        from die_tpu.utils.profiling import trace

        # compile everything OUTSIDE the trace window so the artifact shows
        # steady-state device work, not tracing/compilation
        measure(dyn, args.field, args.envs, args.steps)
        measure_exact(args.field, min(args.envs, 8), args.steps)
        with trace(args.trace):
            measure(dyn, args.field, args.envs, args.steps, reps=1,
                    annotate_name="rollout")
            measure_exact(args.field, min(args.envs, 8), args.steps, reps=1,
                          annotate_name="exact_rollout")
        print(f"trace written to {args.trace}")

    r1 = measure(dyn, args.field, args.envs, args.steps)
    r2 = measure(dyn, args.field, args.envs * 2, args.steps)
    print(f"batch scaling  B={args.envs}: {r1:,.0f} env-steps/s"
          f"   2B: {r2:,.0f}  (efficiency {r2 / (2 * r1) * 100:.1f}%)")

    if n_dev > 1:
        mesh = env_mesh()
        b = args.envs * n_dev
        rd1 = measure(dyn, args.field, args.envs, args.steps,
                      mesh=env_mesh(1))
        rdn = measure(dyn, args.field, b, args.steps, mesh=mesh)
        eff = rdn / (n_dev * rd1) * 100
        print(f"mesh scaling   1 dev ({args.envs} envs): {rd1:,.0f}   "
              f"{n_dev} dev ({b} envs): {rdn:,.0f}  "
              f"(per-device efficiency {eff:.1f}%)")
        # On a virtual-device CPU mesh the devices SHARE physical cores, so
        # per-device efficiency is not a hardware number; the meaningful
        # quantity there is SPMD overhead: same total batch, sharded over
        # the mesh vs run on one device.
        r_same_1 = measure(dyn, args.field, b, args.steps, mesh=env_mesh(1))
        ovh = rdn / r_same_1 * 100
        print(f"SPMD overhead  {b} envs on 1 dev: {r_same_1:,.0f}   "
              f"sharded over {n_dev}: {rdn:,.0f}  "
              f"(sharded/unsharded {ovh:.1f}% — ~100% means the mesh adds "
              f"no overhead; >100% on virtual CPU devices reflects "
              f"scheduling, not hardware)")


if __name__ == "__main__":
    main()
