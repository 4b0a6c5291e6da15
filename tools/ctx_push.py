"""Round-5c: train the CTX family (wide + depthwise-3x3 context) on the
tuned 16-dir lattice — warm from the EXACT embedding of the 755.96 wide
record (embed_wide_into_ctx) and cold CMAES (the searcher that won the
wide record outright).  Updates docs/artifacts/lattice16_mlp_ctx.npz only
if a config beats the wide record on both select and full held-out.
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
        embed_wide_into_ctx,
        init_mlp_ctx_params,
        learned_fast_rollout,
        train_lattice,
    )
    from die_tpu.learn.es import CMAES, PGPE  # noqa: F401

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

    log({"item": "ctx_boot", "backend": jax.devices()[0].platform})
    wide = np.load("docs/artifacts/lattice16_mlp_wide.npz")["params"]
    embedded = jnp.asarray(embed_wide_into_ctx(wide))
    emb_sel = heldout(embedded, 8, SELECT_SEED0)
    log({"item": "ctx_embed_select", "select": emb_sel})  # == wide's 752.9

    RECORD_SELECT, RECORD_HELD = 752.88, 755.96
    results = []
    CONFIGS = [
        ("ctx_warm_cma_s005", 300, 64, 40, "embed", 0.05),
        ("ctx_warm_cma_s01", 300, 64, 41, "embed", 0.1),
        ("ctx_warm_pgpe_r015", 300, 64, 42, "embed", None),
        ("ctx_cold_cma_s03", 300, 64, 43, "cold", 0.3),
        ("ctx_cold_cma_s03_e600", 600, 64, 44, "cold", 0.3),
    ]
    for label, epochs, pop, seed, start, sigma in CONFIGS:
        cfg = LatticeTrainConfig(field_size=(64, 128), epochs=epochs,
                                 epoch_iters=STEPS, popsize=pop,
                                 envs_per_eval=8, seed=seed)
        p0 = embedded if start == "embed" \
            else init_mlp_ctx_params(jr.PRNGKey(0))
        sf = None
        if sigma is not None:
            sf = lambda d, s=sigma: CMAES(d, popsize=pop,  # noqa: E731
                                          stdev_init=s)
        t0 = time.perf_counter()
        trained, _, _ = train_lattice(
            DYN, cfg, params_init=p0, common_random_envs=True,
            radius_init=0.15, searcher_fn=sf)
        wall = time.perf_counter() - t0
        tj = jnp.asarray(trained)
        sel = heldout(tj, 8, SELECT_SEED0)
        log({"item": "ctx", "label": label, "select": sel,
             "wall_s": round(wall, 1)})
        results.append((sel, label, np.asarray(trained)))

    sel, label, best = max(results, key=lambda r: r[0])
    if sel > RECORD_SELECT:
        held = heldout(jnp.asarray(best), 32, HELDOUT_SEED0)
        log({"item": "ctx_heldout", "label": label, "heldout": held})
        if held > RECORD_HELD:
            np.savez("docs/artifacts/lattice16_mlp_ctx.npz", params=best)
            log({"item": "ctx_artifact", "label": label, "heldout": held})
    else:
        log({"item": "ctx_flat", "best_select": sel, "label": label,
             "record_select": RECORD_SELECT})


if __name__ == "__main__":
    main()
