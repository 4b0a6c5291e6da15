"""Neuroevolution on the production (lattice) engine: train the linear,
per-cell MLP, wide-MLP, or conv-NCA turn rule at full engine speed.

This is the high-throughput counterpart of examples/learning_agents.py —
fitness evaluation runs ~10^5 env-steps/s/chip (the linear/MLP/wide
families train INSIDE the K-step Pallas kernel), so population x envs x
steps that take hours on the flat-agent path finish in minutes.

``--searcher cmaes`` uses full-covariance CMA-ES — on the 16-direction
lattice it trains the wide family from a COLD start to the repo-record
forager (docs/ROADMAP.md round 5); PGPE is the default elsewhere.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import datetime
import json
import os

import numpy as np

try:
    from die_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.learned import LatticeTrainConfig, train_lattice
from die_tpu.fast.nca import train_conv_nca
from die_tpu.utils.metrics import JsonlSink, MultiSink, StdoutSink


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="linear",
                    choices=["linear", "mlp", "wide", "ctx", "conv"])
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--popsize", type=int, default=16)
    ap.add_argument("--envs-per-eval", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--searcher", default="pgpe", choices=["pgpe", "cmaes"])
    ap.add_argument("--sigma", type=float, default=0.3,
                    help="CMAES initial step size (cold wide: 0.3)")
    ap.add_argument("--dirs", type=int, default=8, choices=(4, 8, 16))
    ap.add_argument("--outdir", default="saved_models")
    args = ap.parse_args()

    from die_tpu.fast.config import tuned_dynamics

    dyn = tuned_dynamics(args.dirs, init_agent_ratio=0.15,
                         food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(args.size, args.size),
                             epochs=args.epochs, epoch_iters=args.iters,
                             popsize=args.popsize,
                             envs_per_eval=args.envs_per_eval,
                             seed=args.seed)
    searcher_fn = None
    if args.searcher == "cmaes":
        from die_tpu.learn.es import CMAES

        searcher_fn = lambda d: CMAES(d, popsize=args.popsize,  # noqa: E731
                                      stdev_init=args.sigma)

    stamp = datetime.datetime.now(datetime.UTC).strftime("%Y%m%d-%H%M%S")
    run_dir = os.path.join(args.outdir,
                           f"lattice_{args.model}_{args.searcher}")
    os.makedirs(run_dir, exist_ok=True)
    sink = MultiSink(StdoutSink(every=1),
                     JsonlSink(os.path.join(run_dir, f"{stamp}.jsonl")))

    if args.model in ("linear", "mlp", "wide", "ctx"):
        params_init = None
        if args.model == "mlp":
            import jax.random as jr

            from die_tpu.fast.learned import init_mlp_params

            params_init = init_mlp_params(jr.PRNGKey(args.seed),
                                          hidden=args.hidden)
        elif args.model == "wide":
            import jax.random as jr

            from die_tpu.fast.learned import init_mlp_wide_params

            params_init = init_mlp_wide_params(jr.PRNGKey(args.seed),
                                               hidden=args.hidden)
        elif args.model == "ctx":
            import jax.random as jr

            from die_tpu.fast.learned import init_mlp_ctx_params

            params_init = init_mlp_ctx_params(jr.PRNGKey(args.seed),
                                              hidden=args.hidden)
        best, es_state, history = train_lattice(
            dyn, cfg, log_fn=sink, params_init=params_init,
            searcher_fn=searcher_fn, common_random_envs=True)
        np.savez(os.path.join(run_dir, f"{stamp}.npz"), params=best)
    else:
        best, es_state, history = train_conv_nca(dyn, cfg,
                                                 hidden=args.hidden,
                                                 log_fn=sink,
                                                 searcher_fn=searcher_fn)
        np.savez(os.path.join(run_dir, f"{stamp}.npz"),
                 conv=np.asarray(best.conv), head=np.asarray(best.head),
                 bias=np.asarray(best.bias))
    sink.close()
    first, last = history[0]["best"], max(h["best"] for h in history)
    print(json.dumps({"first_epoch_best": first, "overall_best": last,
                      "run_dir": run_dir}))


if __name__ == "__main__":
    main()
