"""Neuroevolution on the production (lattice) engine: train the linear or
conv-NCA turn rule with PGPE at full engine speed.

This is the high-throughput counterpart of examples/learning_agents.py —
fitness evaluation runs ~10^5 env-steps/s/chip, so population x envs x steps
that take hours on the flat-agent path finish in minutes.
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
    ap.add_argument("--model", default="linear", choices=["linear", "conv"])
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--popsize", type=int, default=16)
    ap.add_argument("--envs-per-eval", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outdir", default="saved_models")
    args = ap.parse_args()

    dyn = FastDynamics(init_agent_ratio=0.15, food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(args.size, args.size),
                             epochs=args.epochs, epoch_iters=args.iters,
                             popsize=args.popsize,
                             envs_per_eval=args.envs_per_eval,
                             seed=args.seed)

    stamp = datetime.datetime.now(datetime.UTC).strftime("%Y%m%d-%H%M%S")
    run_dir = os.path.join(args.outdir, f"lattice_{args.model}_pgpe")
    os.makedirs(run_dir, exist_ok=True)
    sink = MultiSink(StdoutSink(every=1),
                     JsonlSink(os.path.join(run_dir, f"{stamp}.jsonl")))

    if args.model == "linear":
        best, es_state, history = train_lattice(dyn, cfg, log_fn=sink)
        np.savez(os.path.join(run_dir, f"{stamp}.npz"), params=best)
    else:
        best, es_state, history = train_conv_nca(dyn, cfg,
                                                 hidden=args.hidden,
                                                 log_fn=sink)
        np.savez(os.path.join(run_dir, f"{stamp}.npz"),
                 conv=np.asarray(best.conv), head=np.asarray(best.head),
                 bias=np.asarray(best.bias))
    sink.close()
    first, last = history[0]["best"], max(h["best"] for h in history)
    print(json.dumps({"first_epoch_best": first, "overall_best": last,
                      "run_dir": run_dir}))


if __name__ == "__main__":
    main()
