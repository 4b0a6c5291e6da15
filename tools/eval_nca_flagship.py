"""Held-out evaluation of a trained exact-engine NCA agent (the
reference-flagship training config, VERDICT r3 item 3).

Protocol (mirrors learn/train.py's fresh-env member evaluation, with a
seed block disjoint from training): for each held-out seed i, initialize a
fresh env + policy state from fold_in(PRNGKey(HELDOUT_SEED), i), roll
``--iters`` fused steps, sum rewards; report the mean over ``--seeds``
episodes for (a) the artifact, (b) an untrained xavier init.

Run:  python tools/eval_nca_flagship.py --artifact saved_models/.../X.npz
      [--cpu] [--seeds 16] [--iters 30] [--size 96]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

HELDOUT_SEED = 777_000  # disjoint from training (train seeds derive from 0)


def heldout_mean(policy, params, dyn, size, iters, seeds, max_agents):
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core import channels as ch
    from die_tpu.core.init import init_env_state
    from die_tpu.parallel.rollout import rollout

    def one(i):
        mk = jr.fold_in(jr.PRNGKey(HELDOUT_SEED), i)
        ek = jr.fold_in(mk, ch.TAG_SESSION_ENV_INIT)
        pk = jr.fold_in(mk, ch.TAG_SESSION_POLICY_INIT)
        rk = jr.fold_in(mk, ch.TAG_SESSION_ROLLOUT)
        state = init_env_state(ek, size, dyn, max_agents)
        pstate = policy.init_state(pk)
        res = rollout(dyn, policy, params, state, pstate, rk, iters)
        return res.total_reward

    vals = np.asarray(jax.jit(jax.vmap(one))(jnp.arange(seeds)))
    return float(vals.mean()), vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--seeds", type=int, default=16)
    ap.add_argument("--dynamics", default="st-perlin-wide")
    ap.add_argument("--ratio", type=float, default=0.10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.random as jr

    from die_tpu.core.config import preset
    from die_tpu.models.nca import NCAPolicy

    dyn = preset(args.dynamics, args.ratio)
    size = (args.size, args.size)
    policy, trained = NCAPolicy.load(args.artifact)
    untrained = policy.init_model_params(jr.PRNGKey(HELDOUT_SEED + 1))

    t0 = time.perf_counter()
    m_tr, v_tr = heldout_mean(policy, trained, dyn, size, args.iters,
                              args.seeds, args.size * args.size)
    m_un, v_un = heldout_mean(policy, untrained, dyn, size, args.iters,
                              args.seeds, args.size * args.size)
    rec = {"artifact": args.artifact, "heldout_seeds": args.seeds,
           "iters": args.iters, "size": args.size,
           "dynamics": args.dynamics,
           "trained_mean": round(m_tr, 2), "untrained_mean": round(m_un, 2),
           "trained_wins_frac": round(float((v_tr > v_un).mean()), 3),
           "wall_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
