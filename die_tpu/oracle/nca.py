"""NumPy oracle twin of the NCA policy (die_tpu/models/nca.py).

Shares the backend-generic conv/tanh spec (ops/convops, mathx) with numpy
arrays and the numpy RNG twin, for bitwise comparison of learned-agent
rollouts against the compiled engine.
"""
from __future__ import annotations

import numpy as np

from die_tpu.core import channels as ch
from die_tpu.core.mathx import tanh
from die_tpu.core.rng import np_fold_in, np_random_bits, uniform01_from_bits
from die_tpu.models.nca import nca_layer_plan
from die_tpu.oracle.env import cells_of
from die_tpu.ops.convops import circular_conv, xavier_uniform_bound


class OracleNCAAgent:
    def __init__(self, scale=0.1, deposit=1.0, with_agent_channel=True,
                 kernel_sizes=(3,), p_agent_dropout=0.0):
        self._scale = float(scale)
        self._deposit = float(deposit)
        self._p_dropout = float(p_agent_dropout)
        self.obs_channel_idx = (
            (ch.CH_MED_AGENTS, ch.CH_MED_FOOD, ch.CH_MED_CHEM)
            if with_agent_channel else (ch.CH_MED_FOOD, ch.CH_MED_CHEM)
        )
        self.plan = nca_layer_plan(len(self.obs_channel_idx),
                                   ch.NUM_ACTION_CHANNELS,
                                   tuple(int(k) for k in kernel_sizes))
        self.params = None

    def init_model_params(self, key):
        kernels = []
        for li, (c_in, k, c_out) in enumerate(self.plan):
            bound = xavier_uniform_bound(c_in, c_out, k)
            u = uniform01_from_bits(
                np_random_bits(np_fold_in(key, li), (c_out, c_in, k, k)))
            kernels.append((np.float32(2.0) * u - np.float32(1.0)) * bound)
        self.params = tuple(kernels)
        return self.params

    def forward(self, obs, key):
        agents, medium = obs
        W, H = medium.shape[-2], medium.shape[-1]
        field = medium[np.asarray(self.obs_channel_idx)]
        for kernel in self.params:
            field = circular_conv(field, kernel)
        field = tanh(field)
        if self._p_dropout > 0.0:
            u = uniform01_from_bits(
                np_random_bits(np_fold_in(key, ch.TAG_DRAW_0), (W, H)))
            keep = (u >= np.float32(self._p_dropout)).astype(np.float32)
            field = field * (keep
                             * np.float32(1.0 / (1.0 - self._p_dropout)))[None]

        ix = cells_of(agents[ch.CH_AGT_X], W)
        iy = cells_of(agents[ch.CH_AGT_Y], H)
        coefs = (np.float32(self._scale), np.float32(self._scale),
                 np.float32(self._deposit))
        rows = [field[c][ix, iy] * coefs[c]
                for c in range(ch.NUM_ACTION_CHANNELS)]
        return np.stack(rows)
