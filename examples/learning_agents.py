"""Neuroevolution of the NCA agent — twin of examples/learning_agents.py:112-152.

PGPE (ClipUp) over the conv perception model's weights; metrics to JSONL (and
MLflow when installed); timestamped checkpoints under saved_models/."""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import datetime
import os

from die_tpu.core.config import preset
from die_tpu.learn.train import TrainConfig, train
from die_tpu.models.nca import NCAPolicy
from die_tpu.utils.metrics import JsonlSink, MultiSink, StdoutSink


def run_experiment(field_size=96, epochs=100, epoch_iters=30,
                   dynamics_id="st-perlin-wide", agent_ratio=0.10,
                   popsize=10, seed=0, outdir="saved_models"):
    dyn = preset(dynamics_id, agent_ratio)
    policy = NCAPolicy(scale=0.01, deposit=2.0, kernel_sizes=(3, 3))
    cfg = TrainConfig(field_size=(field_size, field_size),
                      max_agents=field_size * field_size,
                      epochs=epochs, epoch_iters=epoch_iters,
                      popsize=popsize, seed=seed)
    print(f"NCA has {policy.num_params()} parameters; "
          f"searcher=pgpe popsize={popsize}")

    stamp = datetime.datetime.now(datetime.UTC).strftime("%Y%m%d-%H%M%S")
    run_dir = os.path.join(outdir,
                           f"nca_pgpe_epochs{epochs}x{epoch_iters}")
    os.makedirs(run_dir, exist_ok=True)
    sinks = [StdoutSink(every=1), JsonlSink(os.path.join(run_dir,
                                                         f"{stamp}.jsonl"))]
    try:
        from die_tpu.utils.metrics import MlflowSink

        sinks.append(MlflowSink(run_name=f"nca_{stamp}"))
    except Exception:
        pass
    sink = MultiSink(*sinks)

    best_params, es_state, history = train(
        dyn, policy, cfg, log_fn=sink,
        checkpoint_dir=run_dir, checkpoint_every=max(1, epochs // 5))

    agent_file = os.path.join(run_dir, f"{stamp}.npz")
    print(f"Saving the best agent to: {agent_file}")
    policy.save(agent_file, best_params)
    sink.close()
    return best_params, history


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dynamics", default="st-perlin-wide",
                    choices=["st-perlin", "st-perlin-wide", "dyn-pred"])
    ap.add_argument("--popsize", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "alone is captured too early)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run_experiment(field_size=args.size, epochs=args.epochs,
                   epoch_iters=args.iters, dynamics_id=args.dynamics,
                   popsize=args.popsize, seed=args.seed)
