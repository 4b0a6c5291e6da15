#!/usr/bin/env python
"""Round-5 measurement: the per-cell MLP turn rule's kernel cost and ES
training rate vs the linear rule and the conv-NCA (the VERDICT-r4 #1
"done =" table: expected >= 5x the conv's 18.5K XLA training rate).

Items (offset-subtracted, bench_banded.py methodology):
  rollout rates at 128^2 B=256 and 256^2 B=64, T=256, kernel path:
      jones / linear / mlp8 / mlp4  (+ mlp8 on the XLA scan for the gap)
  training rates at the round-4 A/B config (128^2, popsize 32,
      8 envs/eval, 256 iters/epoch, CRN): one full jitted generation
      (ask + population eval + tell) for mlp8 kernel / mlp8 XLA /
      linear kernel / conv-NCA hidden-8 XLA.

Appends to tools/tpu_mlp_rate_log.jsonl.  Run serially (one TPU process).
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

from die_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import jax.random as jr

LOG_PATH = "/root/repo/tools/tpu_mlp_rate_log.jsonl"


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG_PATH, "a") as f:
        f.write(json.dumps(kw) + "\n")


def sync(x):
    return float(np.asarray(x))


def timed(f, *a, reps=3):
    sync(f(*a))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def null_offset():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    return timed(f, x, reps=5)


def guard(name, fn):
    t0 = time.time()
    try:
        fn()
    except Exception as e:
        log(item=name, error=str(e)[:500], wall=round(time.time() - t0, 1))
        traceback.print_exc()


OFF = None


def rollout_rates(F, B, T=256):
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.learned import (
        init_mlp_ctx_params,
        init_mlp_params,
        init_mlp_wide_params,
        init_turn_params,
        learned_fast_rollout,
    )
    from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

    dyn = FastDynamics()
    keys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
    states = jax.jit(jax.vmap(lambda k: fast_init_jax(k, (F, F), dyn)))(keys)
    rkeys = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))

    def kernel_run(params):
        @jax.jit
        def run(states, rkeys):
            roll = lambda s, k: pallas_fast_rollout_multi(  # noqa: E731
                dyn, s, k, T, num_inner=T, turn_params=params)
            _, rew, _ = jax.vmap(roll)(states, rkeys)
            return jnp.sum(rew)

        return run

    variants = [
        ("jones", kernel_run(None)),
        ("linear", kernel_run(init_turn_params(jr.PRNGKey(7)))),
        ("mlp8", kernel_run(init_mlp_params(jr.PRNGKey(7)))),
        ("mlp4", kernel_run(init_mlp_params(jr.PRNGKey(7), hidden=4))),
        ("wide8", kernel_run(init_mlp_wide_params(jr.PRNGKey(7)))),
        ("ctx8", kernel_run(init_mlp_ctx_params(jr.PRNGKey(7)))),
    ]
    mlp8 = init_mlp_params(jr.PRNGKey(7))

    @jax.jit
    def xla_run(states, rkeys):
        roll = lambda s, k: learned_fast_rollout(  # noqa: E731
            dyn, mlp8, s, k, T)
        _, rew, _ = jax.vmap(roll)(states, rkeys)
        return jnp.sum(rew)

    variants.append(("mlp8_xla", xla_run))

    for tag, run in variants:
        def one(tag=tag, run=run):
            best = timed(run, states, rkeys) - OFF
            log(item=f"rollout_{F}_{tag}", B=B, T=T,
                secs=round(best, 4),
                env_steps_per_s=round(B * T / best, 1))

        guard(f"rollout_{F}_{tag}", one)


def training_rates():
    """One full jitted ES generation (ask + CRN population eval + tell),
    round-4 A/B config: 128^2, popsize 32, 8 envs/eval, 256 iters/epoch."""
    from jax.flatten_util import ravel_pytree

    from die_tpu.core.mathx import tree_sum
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.learned import (
        init_mlp_params,
        init_turn_params,
        learned_fast_rollout,
        learned_fast_rollout_auto,
    )
    from die_tpu.learn.es import PGPE

    dyn = FastDynamics()
    POP, ENVS, T, F = 32, 8, 256, (128, 128)

    def make_gen(params0_tree, roll_fn):
        flat0, unravel = ravel_pytree(params0_tree)
        searcher = PGPE(flat0.shape[0], popsize=POP,
                        center_learning_rate=0.05, radius_init=0.5,
                        max_speed=0.1)
        es_state = searcher.init(flat0)

        def eval_member(flat_params, member_key):
            params = unravel(flat_params)

            def one_env(k):
                st = fast_init_jax(jr.fold_in(member_key, k), F, dyn)
                _, rewards, _ = roll_fn(params, st,
                                        jr.fold_in(member_key, 1000 + k))
                return tree_sum(rewards)

            per_env = jax.vmap(one_env)(jnp.arange(ENVS))
            return tree_sum(per_env) / np.float32(ENVS)

        @jax.jit
        def generation(es_state, key):
            pop, eps = searcher.ask(es_state, jr.fold_in(key, 0))
            member_keys = jnp.broadcast_to(
                jnp.asarray(jr.fold_in(key, 1)), (POP, 2))
            fitnesses = jax.vmap(eval_member)(pop, member_keys)
            es_state = searcher.tell(es_state, eps, fitnesses)
            return es_state, tree_sum(fitnesses)

        return generation, es_state

    def time_gen(tag, params0, roll_fn):
        gen, es0 = make_gen(params0, roll_fn)

        def run(key):
            st, s = gen(es0, key)
            return s

        best = timed(run, jr.PRNGKey(3)) - OFF
        steps = POP * ENVS * T
        log(item=f"train_{tag}", popsize=POP, envs=ENVS, T=T,
            secs=round(best, 4),
            train_env_steps_per_s=round(steps / best, 1))

    mlp8 = init_mlp_params(jr.PRNGKey(0))
    lin = init_turn_params(jr.PRNGKey(0))
    guard("train_mlp8_kernel", lambda: time_gen(
        "mlp8_kernel", mlp8,
        lambda p, s, k: learned_fast_rollout_auto(dyn, p, s, k, T)))
    guard("train_mlp8_xla", lambda: time_gen(
        "mlp8_xla", mlp8,
        lambda p, s, k: learned_fast_rollout(dyn, p, s, k, T)))
    guard("train_linear_kernel", lambda: time_gen(
        "linear_kernel", lin,
        lambda p, s, k: learned_fast_rollout_auto(dyn, p, s, k, T)))

    from die_tpu.fast.nca import (
        ConvTurnParams,
        conv_nca_rollout,
        init_conv_turn_params,
    )

    conv = tuple(init_conv_turn_params(jr.PRNGKey(0), hidden=8))
    guard("train_conv8_xla", lambda: time_gen(
        "conv8_xla", conv,
        lambda p, s, k: conv_nca_rollout(dyn, ConvTurnParams(*p), s, k, T)))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(item="start", which=which, backend=jax.devices()[0].platform)
    OFF = null_offset()
    log(item="null_offset", ms=round(OFF * 1e3, 2))
    if which in ("all", "rollout"):
        rollout_rates(128, 256)
        rollout_rates(256, 64)
    if which in ("all", "train"):
        training_rates()
    log(item="done", which=which)
