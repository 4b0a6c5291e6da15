"""Neural-CA perception policy — twin of ``NeuralAutomataAgent`` +
``ConvolutionModel`` (core/agent/evo.py:45-209), torch-free.

Architecture (core/agent/evo.py:74-104): a stack of circular-padded bias-free
conv layers mapping obs channels -> ... -> action channels, one final Tanh,
then an optional whole-field dropout mask "for breaking synchrony between
agent actions" (core/agent/evo.py:98-102,112-118).  The field output is
gathered per agent at its cell (``tensor_by_agents``, core/utils.py:56-65)
and rescaled by [scale, scale, deposit] (core/agent/evo.py:138,183-186).

Params are a tuple of conv kernels (a pytree — trainable by the ES loop in
die_tpu/learn).  Serialization mirrors ``TorchAgent.save/load``
(core/agent/evo.py:24-42): an ``.npz`` holding both the constructor params
(JSON) and the kernel arrays.
"""
from __future__ import annotations

import io
import json
import os
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.env import agent_cells, gather_field
from die_tpu.core.mathx import tanh
from die_tpu.core.rng import uniform01_from_bits
from die_tpu.models.base import Policy, register
from die_tpu.ops.convops import circular_conv, xavier_uniform_bound


def nca_layer_plan(num_obs_channels: int, num_act_channels: int,
                   kernel_sizes: Sequence[int]):
    """(in_ch, k, out_ch) per layer — core/agent/evo.py:78-93: all layers
    preserve the obs-channel count except the last, which maps to actions."""
    n = len(kernel_sizes)
    in_chans = [num_obs_channels] * n
    out_chans = [num_obs_channels] * (n - 1) + [num_act_channels]
    return list(zip(in_chans, kernel_sizes, out_chans))


@register
class NCAPolicy(Policy):
    def __init__(self,
                 scale: float = 0.1,
                 deposit: float = 1.0,
                 with_agent_channel: bool = True,
                 kernel_sizes: Sequence[int] = (3,),
                 p_agent_dropout: float = 0.0):
        self._scale = float(scale)
        self._deposit = float(deposit)
        self._with_agent_channel = bool(with_agent_channel)
        self._kernel_sizes = tuple(int(k) for k in kernel_sizes)
        self._p_dropout = float(p_agent_dropout)
        self.obs_channel_idx = (
            (ch.CH_MED_AGENTS, ch.CH_MED_FOOD, ch.CH_MED_CHEM)
            if with_agent_channel else (ch.CH_MED_FOOD, ch.CH_MED_CHEM)
        )
        self.plan = nca_layer_plan(len(self.obs_channel_idx),
                                   ch.NUM_ACTION_CHANNELS,
                                   self._kernel_sizes)

    def init_params(self):
        return {
            "scale": self._scale, "deposit": self._deposit,
            "with_agent_channel": self._with_agent_channel,
            "kernel_sizes": list(self._kernel_sizes),
            "p_agent_dropout": self._p_dropout,
        }

    # ------------------------------------------------------------- params
    def init_model_params(self, key) -> Tuple:
        """Xavier-uniform conv stack (core/agent/evo.py:107-110)."""
        kernels = []
        for li, (c_in, k, c_out) in enumerate(self.plan):
            bound = xavier_uniform_bound(c_in, c_out, k)
            u = uniform01_from_bits(
                jr.bits(jr.fold_in(key, li), (c_out, c_in, k, k), jnp.uint32))
            kernels.append((np.float32(2.0) * u - np.float32(1.0)) * bound)
        return tuple(kernels)

    def num_params(self) -> int:
        return sum(c_out * c_in * k * k for c_in, k, c_out in self.plan)

    # ------------------------------------------------------------- forward
    def forward(self, params, pstate, obs, key):
        agents, medium = obs
        W, H = medium.shape[-2], medium.shape[-1]
        field = medium[jnp.asarray(self.obs_channel_idx, jnp.int32)]
        for kernel in params:
            field = circular_conv(field, kernel)
        field = tanh(field)
        if self._p_dropout > 0.0:
            u = uniform01_from_bits(
                jr.bits(jr.fold_in(key, ch.TAG_DRAW_0), (W, H), jnp.uint32))
            keep = (u >= np.float32(self._p_dropout)).astype(jnp.float32)
            mask = keep * np.float32(1.0 / (1.0 - self._p_dropout))
            field = field * mask[None, :, :]

        ix, iy = agent_cells(agents, (W, H))
        coefs = (np.float32(self._scale), np.float32(self._scale),
                 np.float32(self._deposit))
        rows = [gather_field(field[c], ix, iy) * coefs[c]
                for c in range(ch.NUM_ACTION_CHANNELS)]
        return jnp.stack(rows), pstate

    def render(self, params, obs):
        """Sense-output RGB view — twin of NeuralAutomataAgent.render
        (core/agent/evo.py:176-181).  Stateless: recomputed from obs."""
        import numpy as np_

        _agents, medium = obs
        field = medium[jnp.asarray(self.obs_channel_idx, jnp.int32)]
        for kernel in params:
            field = circular_conv(field, kernel)
        field = tanh(field)
        rgb = np_.moveaxis(np_.asarray(field), 0, -1)
        return [np_.clip(0.5 * (rgb + 1.0), 0.0, 1.0)]

    # ------------------------------------------------------- persistence
    def save(self, file, params=None):
        """npz bundle: constructor JSON + kernel arrays
        (twin of core/agent/evo.py:24-29)."""
        arrays = {}
        if params is not None:
            arrays = {f"kernel_{i}": np.asarray(k) for i, k in enumerate(params)}
        meta = json.dumps({"type": type(self).__name__,
                           "params": self.init_params()})
        if isinstance(file, (str, os.PathLike)):
            with open(file, "wb") as f:
                np.savez(f, __meta__=np.frombuffer(meta.encode(), np.uint8),
                         **arrays)
        else:
            np.savez(file, __meta__=np.frombuffer(meta.encode(), np.uint8),
                     **arrays)

    @classmethod
    def load(cls, file):
        """Returns (policy, params) — twin of core/agent/evo.py:31-42."""
        data = np.load(file)
        meta = json.loads(bytes(data["__meta__"]).decode())
        policy = cls(**meta["params"])
        kernels = []
        i = 0
        while f"kernel_{i}" in data:
            kernels.append(jnp.asarray(data[f"kernel_{i}"]))
            i += 1
        return policy, (tuple(kernels) if kernels else None)
