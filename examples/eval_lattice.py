"""Held-out evaluation of lattice policies: trained checkpoint vs the
untrained init vs the hand-coded Jones rule.

The reference never quantifies learning efficacy (its training loop replays
the best solution visually, examples/learning_agents.py:103-107); this is
the quantitative twin used for the roadmap's learning-efficacy ledger:
mean episode reward over fresh held-out seeds, identical env/config for
every policy.

THE PROTOCOL (pinned in die_tpu/fast/config.py::EVAL_PROTOCOL and
tests/test_tuned_dirs16.py::test_eval_protocol_pinned): 64x64 fields,
50-step episodes, 32 held-out seeds from block 10_000, dynamics =
``eval_protocol_dynamics(dirs)`` — the lattice's tuned operating point
with init_agent_ratio=0.15, food_infinite=True.  Those two overrides are
load-bearing: the bare tuned config scores 16-dir Jones at 151.6, not the
653.6 every committed artifact number is compared against.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

try:
    from die_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
except Exception:
    pass

import jax

if _os.environ.get("DIE_TPU_CPU"):  # force CPU (env var alone is too late)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr

from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.learned import init_turn_params, learned_fast_rollout
from die_tpu.fast.nca import ConvTurnParams, conv_nca_rollout
from die_tpu.fast.rollout import fast_rollout


def load_params(path):
    data = np.load(path)
    if "params" in data:
        p = jnp.asarray(data["params"])
        # learned_fast_rollout shape-dispatches: rows==3 linear, cols==14
        # the wide MLP, else the per-cell MLP (die_tpu/fast/learned.py)
        kind = ("linear" if p.shape[0] == 3
                else "wide" if p.shape[1] == 14
                else "ctx" if p.shape[1] == 21 else "mlp")
        return kind, p
    bias = jnp.asarray(data["bias"]) if "bias" in data else None
    return "conv", ConvTurnParams(conv=jnp.asarray(data["conv"]),
                                  head=jnp.asarray(data["head"]),
                                  bias=bias)


def mean_heldout_reward(dyn, roll_fn, size, num_seeds, steps, seed0=10_000):
    """Mean total episode reward over ``num_seeds`` fresh envs (vmapped)."""

    def one(i):
        state = fast_init_jax(jr.fold_in(jr.PRNGKey(seed0), i),
                              (size, size), dyn)
        _, rewards, _ = roll_fn(state, jr.fold_in(jr.PRNGKey(seed0 + 1), i))
        return jnp.sum(rewards)

    totals = jax.jit(jax.vmap(one))(jnp.arange(num_seeds))
    return float(np.asarray(jnp.mean(totals)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help=".npz from examples/train_lattice.py")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--seed0", type=int, default=10_000,
                    help="base of the held-out seed block")
    ap.add_argument("--dirs", type=int, default=8, choices=(4, 8, 16),
                    help="lattice directions; evaluated on that lattice's "
                         "tuned operating point (tuned_dynamics)")
    args = ap.parse_args()

    from die_tpu.fast.config import eval_protocol_dynamics

    dyn = eval_protocol_dynamics(args.dirs)
    T = args.steps

    out = {}
    out["jones"] = mean_heldout_reward(
        dyn, lambda s, k: fast_rollout(dyn, s, k, T),
        args.size, args.seeds, T, args.seed0)
    untrained = init_turn_params(jr.PRNGKey(0))
    out["untrained_linear"] = mean_heldout_reward(
        dyn, lambda s, k: learned_fast_rollout(dyn, untrained, s, k, T),
        args.size, args.seeds, T, args.seed0)
    if args.checkpoint:
        kind, params = load_params(args.checkpoint)
        roll = (conv_nca_rollout if kind == "conv"
                else learned_fast_rollout)
        out[f"trained_{kind}"] = mean_heldout_reward(
            dyn, lambda s, k: roll(dyn, params, s, k, T),
            args.size, args.seeds, T, args.seed0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
