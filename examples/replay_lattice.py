"""Replay a trained lattice policy and record it — the reference's
"run the best solution with a plotter" step (examples/learning_agents.py:103-107)
for the production engine."""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import matplotlib
import numpy as np

import jax

if _os.environ.get("DIE_TPU_CPU"):  # force CPU (env var alone is too late)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import jax.random as jr

from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.learned import learned_fast_rollout
from die_tpu.fast.nca import ConvTurnParams, conv_nca_rollout
from die_tpu.fast.render_adapter import make_fast_render_fn
from die_tpu.render.plotting import InteractivePlotter, render_animation
from die_tpu.render.renderer import EnvRenderer


def load_params(path):
    data = np.load(path)
    if "params" in data:
        p = jnp.asarray(data["params"])
        # the rollout shape-dispatches (make_turn_rule): rows==3 linear;
        # cols==14 wide, cols==21 ctx, else the per-cell MLP (round 5)
        kind = ("linear" if p.shape[0] == 3
                else "wide" if p.shape[1] == 14
                else "ctx" if p.shape[1] == 21 else "mlp")
        return kind, p
    bias = jnp.asarray(data["bias"]) if "bias" in data else None
    return "conv", ConvTurnParams(conv=jnp.asarray(data["conv"]),
                                  head=jnp.asarray(data["head"]),
                                  bias=bias)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help=".npz from examples/train_lattice.py")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--steps-per-frame", type=int, default=2)
    ap.add_argument("--out", default="replay.gif")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dirs", type=int, default=8, choices=(4, 8, 16),
                    help="lattice directions; non-8 replays on that "
                         "lattice's tuned operating point (tuned_dynamics)")
    args = ap.parse_args()

    matplotlib.use("Agg")
    kind, params = load_params(args.checkpoint)
    from die_tpu.fast.config import tuned_dynamics

    dyn = tuned_dynamics(args.dirs, init_agent_ratio=0.15,
                         food_infinite=True)
    size = (args.size, args.size)
    holder = {"state": fast_init_jax(jr.PRNGKey(args.seed), size, dyn)}
    roll_key = jr.PRNGKey(args.seed + 1)

    if kind != "conv":
        roll = lambda s, t: learned_fast_rollout(  # noqa: E731
            dyn, params, s, roll_key, args.steps_per_frame, t)
    else:
        roll = lambda s, t: conv_nca_rollout(  # noqa: E731
            dyn, params, s, roll_key, args.steps_per_frame, t)
    step = jax.jit(roll)

    total = {"reward": 0.0}

    def frame_step(i):
        s, rewards, _ = step(holder["state"],
                             jnp.int32(i * args.steps_per_frame))
        holder["state"] = s
        total["reward"] += float(np.asarray(rewards).sum())

    renderer = EnvRenderer(size)
    plotter = InteractivePlotter.get(
        make_fast_render_fn(lambda: holder["state"], renderer), ion=False)
    render_animation(frame_step, plotter, args.out, num_frames=args.frames)
    print(f"wrote {args.out}; total reward {total['reward']:.3f}")


if __name__ == "__main__":
    main()
