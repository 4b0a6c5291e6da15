"""Round-5 final push on the 16-dir wide-MLP record (held-out 755.96,
cold CMAES s0.3 pop64 e300): bigger budgets and capacity, still cold —
pop 128, 600 epochs, hidden 12.  Updates the artifact only if a config
beats the record on BOTH the select block and the full held-out block.
Appends to tools/sweep_mlp16_log.jsonl.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(rec):
    rec = dict(rec, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    print(json.dumps(rec), flush=True)
    with open("tools/sweep_mlp16_log.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    from die_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.config import EVAL_PROTOCOL, eval_protocol_dynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.learned import (
        LatticeTrainConfig,
        init_mlp_wide_params,
        learned_fast_rollout,
        train_lattice,
    )
    from die_tpu.learn.es import CMAES

    DYN = eval_protocol_dynamics(16)
    SIZE, STEPS = EVAL_PROTOCOL["size"], EVAL_PROTOCOL["steps"]
    SELECT_SEED0, HELDOUT_SEED0 = 20_000, EVAL_PROTOCOL["seed0"]

    def heldout(params, num_seeds, seed0):
        def one(i):
            st = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i),
                               (SIZE, SIZE), DYN)
            _, rewards, _ = learned_fast_rollout(
                DYN, params, st, jr.fold_in(jr.PRNGKey(seed0 + 1), i), STEPS)
            return jnp.sum(rewards)

        totals = jax.jit(jax.vmap(one))(jnp.arange(num_seeds))
        return float(np.asarray(jnp.mean(totals)))

    RECORD_SELECT, RECORD_HELD = 752.88, 755.96
    log({"item": "push_boot", "backend": jax.devices()[0].platform})

    CONFIGS = [
        ("push_cma_e600", 600, 64, 8, 30),
        ("push_cma_p128_e600", 600, 128, 8, 31),
        ("push_cma_h12_e600", 600, 64, 12, 32),
    ]
    best = None
    for label, epochs, pop, hidden, seed in CONFIGS:
        cfg = LatticeTrainConfig(field_size=(64, 128), epochs=epochs,
                                 epoch_iters=STEPS, popsize=pop,
                                 envs_per_eval=8, seed=seed)
        cold0 = init_mlp_wide_params(jr.PRNGKey(0), hidden=hidden)
        t0 = time.perf_counter()
        trained, _, _ = train_lattice(
            DYN, cfg, params_init=cold0, common_random_envs=True,
            searcher_fn=lambda d, p=pop: CMAES(d, popsize=p,
                                               stdev_init=0.3))
        wall = time.perf_counter() - t0
        tj = jnp.asarray(trained)
        sel = heldout(tj, 8, SELECT_SEED0)
        log({"item": "push", "label": label, "select": sel,
             "wall_s": round(wall, 1)})
        if sel > RECORD_SELECT and (best is None or sel > best[0]):
            best = (sel, label, np.asarray(trained))
    if best is not None:
        sel, label, params = best
        held = heldout(jnp.asarray(params), 32, HELDOUT_SEED0)
        log({"item": "push_heldout", "label": label, "heldout": held})
        if held > RECORD_HELD:
            np.savez("docs/artifacts/lattice16_mlp_wide.npz", params=params)
            log({"item": "push_artifact_updated", "label": label,
                 "heldout": held})
    else:
        log({"item": "push_flat", "record_select": RECORD_SELECT})


if __name__ == "__main__":
    main()
