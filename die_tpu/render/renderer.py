"""Env → RGB(A) frame rendering — twin of ``EnvRenderer``/``FieldTrace``
(core/render.py:9-132).

Three views per frame, as in the reference:
  * medium composite: agents→R, env_food→G, chem1→B, with an optional color
    remap via the cross-product trick (core/render.py:50-60)
  * exponential-decay agent trace colorized with a colormap
    (``FieldTrace``, decay = 1 - 1/trace_steps, core/render.py:9-28,104-111)
  * agents-array image reshaped W×H with alive-as-alpha (core/render.py:113-132)

Device arrays come in, host uint8/float images come out; the per-frame trace
is the only host-side state.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from die_tpu.core import channels as ch

FIELD_COLORS = {
    "rgb": None,
    "one": [0.19, -0.3, 0.74],
    "two": [-0.45, 0.65, 0.83],
}


def _colorify(mono: np.ndarray, cmap_id: str = "gray") -> np.ndarray:
    import matplotlib as mpl

    return mpl.colormaps[cmap_id](np.clip(mono, 0.0, 1.0))


class FieldTrace:
    """Exponential-decay accumulation of a field — core/render.py:9-28."""

    def __init__(self, field_size: Tuple[int, int], trace_steps: int = 8):
        self._decay = 1.0 - 1.0 / trace_steps
        self._trace = np.zeros(field_size, np.float32)

    @property
    def trace(self) -> np.ndarray:
        return self._trace

    def as_mask(self, inverse: bool = False) -> np.ndarray:
        return 1.0 - self._trace if inverse else self._trace

    def update(self, field: np.ndarray) -> None:
        self._trace = self._trace * np.float32(self._decay) + field


class EnvRenderer:
    def __init__(self, field_size: Tuple[int, int],
                 is_trace_colored: bool = True,
                 field_colors_id: str = "rgb"):
        self.field_size = field_size
        self._is_trace_colored = is_trace_colored
        color = FIELD_COLORS.get(field_colors_id)
        if field_colors_id == "random":
            color = (np.random.random(3) - 0.5) * 2
        if color is not None:
            color = np.asarray(color, np.float64)
            color = color / np.linalg.norm(color)
            self._rgb_mapper = lambda rgb: np.cross(color, rgb, axisb=-1)
        else:
            self._rgb_mapper = lambda rgb: rgb
        self._agent_trace = FieldTrace(field_size)

    def render(self, medium, agents) -> Sequence[np.ndarray]:
        medium = np.asarray(medium)
        agents = np.asarray(agents)
        return [self._img_medium(medium),
                self._img_trace(medium),
                self._img_agents(agents)]

    def _img_medium(self, medium: np.ndarray) -> np.ndarray:
        rgb = np.stack([medium[ch.CH_MED_AGENTS],
                        medium[ch.CH_MED_FOOD],
                        medium[ch.CH_MED_CHEM]], axis=-1)
        return np.clip(self._rgb_mapper(rgb), 0.0, 1.0)

    def _img_trace(self, medium: np.ndarray) -> np.ndarray:
        self._agent_trace.update(medium[ch.CH_MED_AGENTS])
        cmap_id = "magma" if self._is_trace_colored else "gray"
        return _colorify(self._agent_trace.as_mask(), cmap_id)

    def _img_agents(self, agents: np.ndarray) -> np.ndarray:
        """Agents flat array reshaped to the field with alive-as-alpha
        (core/render.py:113-132)."""
        width, height = self.field_size
        n = agents.shape[-1]
        pad = width * height - n
        if pad > 0:
            agents = np.concatenate(
                [agents, np.zeros((agents.shape[0], pad), agents.dtype)],
                axis=1)
        alive = agents[ch.CH_AGT_ALIVE, :width * height].reshape(height, width)
        food = agents[ch.CH_AGT_FOOD, :width * height].reshape(height, width)
        zero = np.zeros((height, width), np.float32)
        return np.stack([zero, np.clip(food, 0, 1), zero,
                         alive.astype(bool).astype(np.float32)], axis=-1)


class GradientFieldRenderer:
    """Gradient-agent debug view (core/agent/gradient.py:126-135): grad dx→R,
    dy→G, rescaled from [-1,1] to [0,1]."""

    @staticmethod
    def render(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
        r = np.asarray(gx)
        g = np.asarray(gy)
        b = np.zeros_like(r)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(0.5 * (rgb + 1.0), 0.0, 1.0)
