"""Render adapter: fast-engine state -> the exact-engine array layouts, so
the existing EnvRenderer / plotter / GIF pipeline works unchanged."""
from __future__ import annotations

import numpy as np

from die_tpu.fast.env import FastEnvState


def fast_state_to_medium(state: FastEnvState) -> np.ndarray:
    """f32[3, W, H] medium view: (occupancy, env_food, chem)."""
    return np.stack([np.asarray(state.occ),
                     np.asarray(state.env_food),
                     np.asarray(state.chem)])


def fast_state_to_agents(state: FastEnvState) -> np.ndarray:
    """f32[4, W*H] flat agents view (x, y, alive, agent_food) — cell-row-major
    like ``agents_from_medium`` so the agents image reshape works."""
    occ = np.asarray(state.occ)
    W, H = occ.shape
    ix, iy = np.meshgrid(np.arange(W), np.arange(H), indexing="ij")
    alive = occ.reshape(-1)
    x = (ix.reshape(-1) / max(W - 1, 1)).astype(np.float32) * alive
    y = (iy.reshape(-1) / max(H - 1, 1)).astype(np.float32) * alive
    food = np.asarray(state.agent_food).reshape(-1) * alive
    return np.stack([x, y, alive, food]).astype(np.float32)


def make_fast_render_fn(state_getter, renderer):
    """Renderer callable for InteractivePlotter: () -> [imgs]."""

    def render():
        st = state_getter()
        return renderer.render(fast_state_to_medium(st),
                               fast_state_to_agents(st))

    return render
