"""Neuroevolution training loop — twin of ``run_agent``/``run_experiment``
(examples/learning_agents.py:20-152), rebuilt as fused on-device generations.

One generation = one XLA program: sample the mirrored population, roll out
every member over its env(s) with the fused policy∘step scan, reduce fitness,
apply the searcher update.  The population axis vmaps (and can shard over the
mesh's env axis — SURVEY §5.8's all-gather of ES fitness vectors is then an
XLA-inserted collective).

Unlike the reference — which reuses one mutable env across evaluations so
fitness is path-dependent (learning_agents.py:29-37, noted in SURVEY §3-D) —
each evaluation here gets a freshly initialized env from a per-generation
key, which makes fitnesses reproducible and comparable (the reference's
own roadmap flags its env reuse as a hazard).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
from jax.flatten_util import ravel_pytree

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.learn.es import (EsState, OpenAIES, PGPE,
                               es_center, es_spread)
from die_tpu.parallel.rollout import rollout


@dataclass
class TrainConfig:
    field_size: tuple = (96, 96)
    max_agents: Optional[int] = None
    epochs: int = 100
    epoch_iters: int = 50
    popsize: int = 10
    envs_per_eval: int = 1
    searcher: str = "pgpe"  # 'pgpe' | 'openai-es' | 'cmaes' | 'cmaes-full'
    radius_init: float = 1.5
    center_learning_rate: float = 0.05
    stdev_learning_rate: float = 0.1
    max_speed: float = 0.1
    seed: int = 0


def make_searcher(cfg: TrainConfig, num_params: int):
    if cfg.searcher == "pgpe":
        # the reference's rule-of-thumb wiring (learning_agents.py:63-66):
        # max_speed = radius/15, center_lr = max_speed/2
        max_speed = cfg.radius_init / 15.0
        return PGPE(num_params, popsize=cfg.popsize,
                    center_learning_rate=max_speed / 2.0,
                    stdev_learning_rate=cfg.stdev_learning_rate,
                    radius_init=cfg.radius_init,
                    max_speed=max_speed, momentum=0.9)
    if cfg.searcher == "openai-es":
        return OpenAIES(num_params, popsize=cfg.popsize)
    if cfg.searcher == "cmaes":
        from die_tpu.learn.es import SepCMAES

        return SepCMAES(num_params, popsize=cfg.popsize,
                        stdev_init=cfg.radius_init / 15.0)
    if cfg.searcher == "cmaes-full":
        from die_tpu.learn.es import CMAES

        return CMAES(num_params, popsize=cfg.popsize,
                     stdev_init=cfg.radius_init / 15.0)
    raise KeyError(cfg.searcher)


def build_generation_step(dynamics: Dynamics, policy, cfg: TrainConfig,
                          searcher, unravel, mesh=None, mesh_axis="pop"):
    """jitted (EsState, epoch_key) -> (EsState, metrics dict).

    ``mesh``: optional device mesh; the population axis shards over
    ``mesh_axis`` (ES members evaluate data-parallel across devices/hosts)
    with bitwise-identical results to the unsharded run."""

    def eval_member(flat_params, member_key):
        params = unravel(flat_params)
        env_key = jr.fold_in(member_key, ch.TAG_SESSION_ENV_INIT)
        pol_key = jr.fold_in(member_key, ch.TAG_SESSION_POLICY_INIT)
        roll_key = jr.fold_in(member_key, ch.TAG_SESSION_ROLLOUT)

        def one_env(k):
            ek = jr.fold_in(env_key, k)
            rk = jr.fold_in(roll_key, k)
            state = init_env_state(ek, cfg.field_size, dynamics,
                                   cfg.max_agents)
            pstate = policy.init_state(jr.fold_in(pol_key, k))
            res = rollout(dynamics, policy, params, state, pstate, rk,
                          cfg.epoch_iters)
            return res.total_reward

        rewards = jax.vmap(one_env)(jnp.arange(cfg.envs_per_eval))
        return jnp.mean(rewards)

    def generation(es_state: EsState, epoch_key):
        pop, eps = searcher.ask(es_state, jr.fold_in(epoch_key, 0))
        member_keys = jax.vmap(
            lambda i: jr.fold_in(jr.fold_in(epoch_key, 1), i)
        )(jnp.arange(searcher.popsize))
        from die_tpu.learn.es import shard_population, unshard_population

        pop, member_keys = shard_population(mesh, mesh_axis, pop,
                                            member_keys)
        fitnesses = jax.vmap(eval_member)(pop, member_keys)
        fitnesses, eps = unshard_population(mesh, fitnesses, eps)
        es_state = searcher.tell(es_state, eps, fitnesses)
        metrics = {
            "best": jnp.max(fitnesses),
            "mean": jnp.mean(fitnesses),
            "worst": jnp.min(fitnesses),
            "stdev_mean": jnp.mean(es_spread(es_state)),
        }
        return es_state, metrics

    return jax.jit(generation)


def train(dynamics: Dynamics, policy, cfg: TrainConfig,
          log_fn: Optional[Callable] = None,
          checkpoint_dir: Optional[str] = None,
          checkpoint_every: int = 0,
          resume_from: Optional[str] = None,
          start_epoch: int = 0,
          mesh=None):
    """Run the full training loop.  Returns (best_params, es_state, history).

    ``log_fn(epoch, metrics_dict)`` receives host-side floats per epoch
    (metrics sink — the reference used evotorch's MlflowLogger,
    learning_agents.py:80-82; see die_tpu/utils/metrics.py for sinks).
    ``resume_from``: path of an ES checkpoint (.npz from
    ``save_training_state``); continues at ``start_epoch`` with the exact
    searcher state — epochs are keyed by index, so a resumed run replays the
    same generation stream it would have seen uninterrupted.
    """
    params0 = policy.init_model_params(
        jr.fold_in(jr.PRNGKey(cfg.seed), ch.TAG_SESSION_POLICY_INIT))
    flat0, unravel = ravel_pytree(params0)
    searcher = make_searcher(cfg, flat0.shape[0])
    es_state = searcher.init(flat0)
    resumed_best = None
    if resume_from is not None:
        from die_tpu.utils.checkpoint import (
            load_training_best,
            load_training_state,
        )

        es_state = load_training_state(resume_from, es_state)
        es_state = jax.tree.map(jnp.asarray, es_state)
        resumed_best = load_training_best(resume_from)
    gen_step = build_generation_step(dynamics, policy, cfg, searcher,
                                     unravel, mesh=mesh)

    master = jr.PRNGKey(cfg.seed)
    history = []
    best_fit = -np.inf
    best_center = np.asarray(es_center(es_state))
    if resumed_best is not None:
        best_fit, best_center = resumed_best
    t_start = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        es_state, metrics = gen_step(es_state, jr.fold_in(master, epoch))
        m = {k: float(np.asarray(v)) for k, v in metrics.items()}
        m["epoch"] = epoch
        m["wall_s"] = time.time() - t_start
        history.append(m)
        if m["best"] > best_fit:
            best_fit = m["best"]
            best_center = np.asarray(es_center(es_state))
        if log_fn is not None:
            log_fn(epoch, m)
        if checkpoint_dir and checkpoint_every and \
                (epoch + 1) % checkpoint_every == 0:
            from die_tpu.utils.checkpoint import save_training_state

            save_training_state(checkpoint_dir, epoch, es_state, cfg,
                                best_fit=best_fit, best_center=best_center)

    best_params = unravel(jnp.asarray(best_center))
    return best_params, es_state, history
