#!/usr/bin/env python
"""BASELINE config #5 demo: 8192 envs sharded over the device mesh feeding
a PGPE learning loop, preemption-safe via periodic checkpoints.

Reference loop: /root/reference/examples/learning_agents.py:112-152 (one
mutable env, popsize 10, single process).  Here each generation evaluates
popsize x envs-per-eval freshly-seeded lattice envs data-parallel over all
devices of all hosts; resume bitwise-replays the uninterrupted stream
(tests/test_baseline_config5.py pins this at the full 8192-env shape).

Single host (8 virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/train_config5.py --cpu --epochs 5

Multi-host pod: run on every host after setting the usual pod env (or see
tools/pod_bench.sh); jax.distributed is initialized automatically when
DIE_COORD/DIE_NPROC/DIE_PID are set.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--field", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--popsize", type=int, default=16)
    ap.add_argument("--envs-per-eval", type=int, default=512)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--ckpt-dir", default="saved_models/config5")
    ap.add_argument("--ckpt-every", type=int, default=2)
    ap.add_argument("--resume", default=None,
                    help="checkpoint path; continues at --start-epoch")
    ap.add_argument("--start-epoch", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.learned import LatticeTrainConfig, train_lattice
    from die_tpu.parallel.distributed import initialize, process_info

    coord = os.environ.get("DIE_COORD")
    if coord:
        initialize(coord, int(os.environ["DIE_NPROC"]),
                   int(os.environ["DIE_PID"]))
    print("topology:", process_info())

    total = args.popsize * args.envs_per_eval
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("pop",)) \
        if len(devices) > 1 and args.popsize % len(devices) == 0 else None
    print(f"{total} envs/generation "
          f"({args.popsize} members x {args.envs_per_eval} envs), "
          f"mesh: {'pop-sharded over ' + str(len(devices)) + ' devices' if mesh else 'single device'}")

    dyn = FastDynamics(food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(args.field, args.field),
                             epochs=args.epochs, epoch_iters=args.iters,
                             popsize=args.popsize,
                             envs_per_eval=args.envs_per_eval,
                             seed=args.seed)
    best, es, hist = train_lattice(
        dyn, cfg, mesh=mesh,
        log_fn=lambda e, m: print(f"epoch {e}: best {m['best']:.3f} "
                                  f"mean {m['mean']:.3f}", flush=True),
        checkpoint_dir=args.ckpt_dir, checkpoint_every=args.ckpt_every,
        resume_from=args.resume, start_epoch=args.start_epoch)
    print(f"done: best fitness {max(h['best'] for h in hist):.3f}; "
          f"checkpoints in {args.ckpt_dir}")


if __name__ == "__main__":
    main()
