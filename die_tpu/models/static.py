"""Stateless rule-based policies — twins of core/agent/static.py.

ConstPolicy    — core/agent/static.py:9-28: writes one constant
                 (dx, dy, deposit1) vector into every agent slot (dead slots
                 included — they burn action cost; SURVEY §3-B ledger #3).
BrownianPolicy — core/agent/static.py:31-51: uniform random walk, 3-decimal
                 rounded draws, all channels multiplied by the alive mask
                 (``DataInitializer.action_for`` static mask,
                 core/data_init.py:159-165).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.mathx import round3
from die_tpu.core.rng import uniform01_from_bits
from die_tpu.models.base import Policy, register


@register
class ConstPolicy(Policy):
    def __init__(self, delta_xy=(0.0, 0.0), deposit: float = 0.0):
        self._delta_xy = (float(delta_xy[0]), float(delta_xy[1]))
        self._deposit = float(deposit)

    def init_params(self):
        return {"delta_xy": list(self._delta_xy), "deposit": self._deposit}

    def forward(self, params, pstate, obs, key):
        agents, _medium = obs
        n = agents.shape[-1]
        row = jnp.asarray(
            np.array([self._delta_xy[0], self._delta_xy[1], self._deposit],
                     np.float32)
        )
        action = jnp.broadcast_to(row[:, None], (ch.NUM_ACTION_CHANNELS, n))
        return action, pstate


def _uniform_round3(key, n, a: float, b: float):
    """(b-a)*round3(U) + a — ``DataInitializer.get_random``
    (core/data_init.py:168-169) with the contract's bits->uniform transform."""
    u = round3(uniform01_from_bits(jr.bits(key, (n,), jnp.uint32)))
    return np.float32(b - a) * u + np.float32(a)


@register
class BrownianPolicy(Policy):
    def __init__(self, move_scale: float = 0.01, deposit_scale: float = 0.5):
        self._scale = float(move_scale)
        self._dep_scale = float(deposit_scale)

    def init_params(self):
        return {"move_scale": self._scale, "deposit_scale": self._dep_scale}

    def forward(self, params, pstate, obs, key):
        agents, _medium = obs
        n = agents.shape[-1]
        s = self._scale
        dx = _uniform_round3(jr.fold_in(key, ch.TAG_DRAW_0), n, -s, s)
        dy = _uniform_round3(jr.fold_in(key, ch.TAG_DRAW_1), n, -s, s)
        dep = _uniform_round3(jr.fold_in(key, ch.TAG_DRAW_2), n, 0.0,
                              self._dep_scale)
        alive = (agents[ch.CH_AGT_ALIVE] > np.float32(0.0)).astype(jnp.float32)
        action = jnp.stack([dx, dy, dep]) * alive[None, :]
        return action, pstate
