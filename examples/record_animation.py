"""Record a simulation GIF — twin of examples/record_animation.py:11-22."""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import matplotlib

import jax

if _os.environ.get("DIE_TPU_CPU"):  # force CPU (env var alone is too late)
    jax.config.update("jax_platforms", "cpu")

import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.models.gradient import PhysarumPolicy
from die_tpu.parallel.rollout import policy_env_step
from die_tpu.render.plotting import InteractivePlotter, render_animation
from die_tpu.render.renderer import EnvRenderer


def record_fast(filename="animation.gif", field_size=(128, 128),
                num_frames=100, agent_ratio=0.15, seed=0, headless=True,
                steps_per_frame=2, flow="none", num_dirs=8, tuned=False):
    """GIF of the fast lattice engine.  ``flow='wave'`` is the visual twin
    of the reference's dyn-pred dynamic-environment preset
    (/root/reference/examples/learning_agents.py:124-129)."""
    if headless:
        matplotlib.use("Agg")
    from die_tpu.core.config import FlowConfig
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_jax
    from die_tpu.fast.render_adapter import make_fast_render_fn
    from die_tpu.fast.rollout import fast_rollout

    if tuned:
        from die_tpu.fast.config import tuned_dynamics

        dyn = tuned_dynamics(num_dirs, init_agent_ratio=agent_ratio,
                             flow=FlowConfig(kind=flow))
    else:
        dyn = FastDynamics(init_agent_ratio=agent_ratio, num_dirs=num_dirs,
                           flow=FlowConfig(kind=flow))
    master = jr.PRNGKey(seed)
    holder = {"state": fast_init_jax(
        jr.fold_in(master, ch.TAG_SESSION_ENV_INIT), field_size, dyn)}
    roll_key = jr.fold_in(master, ch.TAG_SESSION_ROLLOUT)
    import jax.numpy as jnp

    step = jax.jit(lambda s, t: fast_rollout(dyn, s, roll_key,
                                             steps_per_frame, t))

    def frame_step(i):
        s, _, _ = step(holder["state"], jnp.int32(i * steps_per_frame))
        holder["state"] = s

    renderer = EnvRenderer(field_size)
    plotter = InteractivePlotter.get(
        make_fast_render_fn(lambda: holder["state"], renderer),
        ion=not headless)
    render_animation(frame_step, plotter, filename, num_frames=num_frames)
    print(f"wrote {filename}")


def record(filename="animation.gif", field_size=(128, 128), num_frames=100,
           agent_ratio=0.15, seed=0, headless=True, artifact=None):
    """``artifact``: path of a trained NCAPolicy .npz (the flagship
    training run's checkpoint) — replays the learned agent under the
    st-perlin-wide dynamics it was trained on instead of Physarum."""
    if headless:
        matplotlib.use("Agg")
    n = field_size[0] * field_size[1]
    if artifact:
        from die_tpu.core.config import preset
        from die_tpu.models.nca import NCAPolicy

        dyn = preset("st-perlin-wide", agent_ratio)
        policy, nca_params = NCAPolicy.load(artifact)
    else:
        dyn = Dynamics(init_agent_ratio=agent_ratio)
        policy = PhysarumPolicy(max_agents=n, scale=0.006, turn_angle=30,
                                sense_offset=0.04)
        nca_params = None
    master = jr.PRNGKey(seed)
    holder = {
        "state": init_env_state(jr.fold_in(master, ch.TAG_SESSION_ENV_INIT),
                                field_size, dyn, n),
        "pstate": policy.init_state(
            jr.fold_in(master, ch.TAG_SESSION_POLICY_INIT)),
    }
    roll_key = jr.fold_in(master, ch.TAG_SESSION_ROLLOUT)
    step = jax.jit(lambda s, p, k: policy_env_step(dyn, policy, nca_params,
                                                   s, p, k))

    def frame_step(i):
        kt = jr.fold_in(roll_key, i)
        s, p, _ = step(holder["state"], holder["pstate"], kt)
        holder["state"], holder["pstate"] = s, p

    renderer = EnvRenderer(field_size)
    plotter = InteractivePlotter.get(
        lambda: renderer.render(holder["state"].medium,
                                holder["state"].agents),
        ion=not headless)
    render_animation(frame_step, plotter, filename, num_frames=num_frames)
    print(f"wrote {filename}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="animation.gif")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--engine", default="exact", choices=["exact", "fast"])
    ap.add_argument("--flow", default="none",
                    choices=["none", "wave", "perlin"],
                    help="fast engine only: dynamic food flow (dyn-pred)")
    ap.add_argument("--dirs", type=int, default=8, choices=[4, 8, 16],
                    help="fast engine only: lattice resolution")
    ap.add_argument("--tuned", action="store_true",
                    help="use the per-lattice tuned operating point "
                         "(fast/config.py::tuned_dynamics)")
    ap.add_argument("--artifact", default=None,
                    help="exact engine: replay a trained NCAPolicy .npz "
                         "(e.g. docs/artifacts/nca_flagship_pgpe1000.npz) "
                         "under st-perlin-wide dynamics")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.engine == "fast":
        record_fast(args.out, (args.size, args.size), args.frames,
                    flow=args.flow, num_dirs=args.dirs, tuned=args.tuned)
    else:
        record(args.out, (args.size, args.size), args.frames,
               artifact=args.artifact)
