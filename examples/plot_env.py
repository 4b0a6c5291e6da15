"""Initializer / field visual demos — twin of examples/plot_env.py and
examples/plot_perlin_noise.py: render the Perlin food init, the agent
occupancy, and a wave-flow sequence."""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import matplotlib
import numpy as np

import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics, FlowConfig
from die_tpu.core.init import build_medium
from die_tpu.ops.waves import flow_time, wave_field


def plot_init(field_size=(128, 128), seed=0, out=None):
    import matplotlib.pyplot as plt

    dyn = Dynamics(init_agent_ratio=0.1)
    medium = np.asarray(build_medium(jr.PRNGKey(seed), field_size, dyn))
    fig, axs = plt.subplots(1, 3, figsize=(12, 4))
    for ax, idx, title in zip(axs, range(3),
                              ["agents occupancy", "env_food (perlin)",
                               "chem1"]):
        ax.imshow(medium[idx], cmap="viridis")
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")
    else:
        plt.show()


def plot_perlin_flow(field_size=(128, 128), frames=4, out=None):
    """Twin of examples/plot_perlin_noise.py: the time-varying Perlin food
    flow at several time steps."""
    import jax
    import matplotlib.pyplot as plt

    from die_tpu.ops.waves import perlin_flow_field

    flow = FlowConfig(kind="perlin", octaves=6, dt=0.02, seed=3)
    field = jax.jit(lambda s: perlin_flow_field(flow, field_size, s))
    fig, axs = plt.subplots(1, frames, figsize=(4 * frames, 4))
    for i, ax in enumerate(np.atleast_1d(axs)):
        ax.imshow(np.asarray(field(jnp.int32(i * 20))), cmap="viridis")
        ax.set_title(f"perlin flow F(t_{i * 20})")
        ax.axis("off")
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")
    else:
        plt.show()


def plot_waves(field_size=(128, 128), frames=4, out=None):
    import matplotlib.pyplot as plt

    import jax

    flow = FlowConfig(kind="wave")
    # jit: eager per-op dispatch over the axon tunnel is prohibitively slow
    wave = jax.jit(lambda s: wave_field(field_size, flow_time(flow, s)))
    fig, axs = plt.subplots(1, frames, figsize=(4 * frames, 4))
    for i, ax in enumerate(np.atleast_1d(axs)):
        t = flow_time(flow, np.int32(i * 25))
        ax.imshow(np.asarray(wave(jnp.int32(i * 25))), cmap="magma")
        ax.set_title(f"wave F(t={float(t):.2f})")
        ax.axis("off")
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")
    else:
        plt.show()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--waves", action="store_true")
    ap.add_argument("--perlin", action="store_true")
    ap.add_argument("--headless", action="store_true")
    args = ap.parse_args()
    if args.headless or args.out:
        matplotlib.use("Agg")
    if args.waves:
        plot_waves(out=args.out)
    elif args.perlin:
        plot_perlin_flow(out=args.out)
    else:
        plot_init(out=args.out)
