#!/usr/bin/env python
"""Round-5 A/B (VERDICT r4 weak #5): the reference-flagship NCA training
config (exact engine, 96^2, PGPE popsize 10, 30 iters/epoch — the
committed docs/artifacts/nca_flagship run) timed on the TPU chip vs the
CPU backend, so the CPU choice for the committed artifact carries a
measured rationale instead of a prose one.

Usage: python tools/flagship_ab.py cpu|tpu [epochs]
Appends to tools/flagship_ab_log.jsonl.  Run serially with other TPU work.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

LOG = "/root/repo/tools/flagship_ab_log.jsonl"


def log(**kw):
    kw["ts"] = round(time.time(), 1)
    print(json.dumps(kw), flush=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        from die_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    from die_tpu.core.config import preset
    from die_tpu.learn.train import TrainConfig, train
    from die_tpu.models.nca import NCAPolicy

    dyn = preset("st-perlin-wide", 0.10)
    policy = NCAPolicy(scale=0.01, deposit=2.0, kernel_sizes=(3, 3))
    F = 96
    cfg = TrainConfig(field_size=(F, F), max_agents=F * F, epochs=epochs,
                      epoch_iters=30, popsize=10, seed=0)

    times = []
    t_last = [time.perf_counter()]

    def log_fn(epoch, metrics):
        now = time.perf_counter()
        times.append(now - t_last[0])
        t_last[0] = now
        log(item="epoch", backend=backend, epoch=epoch,
            secs=round(times[-1], 2), best=round(metrics.get("best", 0), 2))

    train(dyn, policy, cfg, log_fn=lambda e, m: log_fn(e, m))
    steady = min(times[1:]) if len(times) > 1 else times[0]
    env_steps = cfg.popsize * cfg.envs_per_eval * cfg.epoch_iters
    log(item="summary", backend=backend, field=F,
        steady_epoch_s=round(steady, 2),
        train_env_steps_per_s=round(env_steps / steady, 1),
        projected_1000_epochs_min=round(steady * 1000 / 60, 1))


if __name__ == "__main__":
    main()
