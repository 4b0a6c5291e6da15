"""StateBuilder — the reference's ``DataInitializer`` builder API
(core/data_init.py:92-253) for composing custom start states.

The canonical init (``init_env_state``) covers the standard recipe; this
builder exposes the same composable pieces for custom experiments:

    state = (StateBuilder((64, 64), key)
             .with_const("env_food", 0.5)
             .with_food_perlin(threshold=0.25, octaves=8)
             .with_chem(threshold=0.1)
             .with_agents(ratio=0.1)
             .build_env_state(max_agents=4096))

Channel fills follow the reference semantics: uniform noise rounded to 3
decimals (get_random, core/data_init.py:168-169), Perlin masked to
[0, threshold] (core/data_init.py:228-236), occupancy from thresholded
uniforms (core/data_init.py:222-226).  Draw-site keys fold the channel name
hash, so fills are order-independent.
"""
from __future__ import annotations

import zlib

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.init import agents_from_medium
from die_tpu.core.mathx import round3
from die_tpu.core.rng import uniform01_from_bits
from die_tpu.core.state import EnvState
from die_tpu.ops.perlin import lattice_gradients_jax, perlin_field

_CHANNEL_INDEX = {"agents": ch.CH_MED_AGENTS, "env_food": ch.CH_MED_FOOD,
                  "chem1": ch.CH_MED_CHEM}


def _site_key(key, name: str, salt: int = 0):
    return jr.fold_in(jr.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF),
                      salt)


class StateBuilder:
    def __init__(self, field_size, key):
        self._size = tuple(field_size)
        self._key = key
        self._channels = {name: jnp.zeros(self._size, jnp.float32)
                          for name in _CHANNEL_INDEX}

    # ------------------------------------------------------------- fills
    def with_const(self, channel: str, value: float = 0.0):
        self._channels[channel] = jnp.full(self._size, np.float32(value))
        return self

    def with_noise(self, channel: str, a: float = 0.0, b: float = 1.0):
        u = round3(uniform01_from_bits(jr.bits(
            _site_key(self._key, channel, 1), self._size, jnp.uint32)))
        self._channels[channel] = np.float32(b - a) * u + np.float32(a)
        return self

    def _perlin(self, channel: str, octaves: int):
        grads = lattice_gradients_jax(_site_key(self._key, channel, 2),
                                      octaves)
        return perlin_field(grads, self._size, octaves)

    def _masked(self, sampled, mask_below: float, mask_above: float):
        mask = (sampled >= np.float32(mask_below)) \
            & (sampled <= np.float32(mask_above))
        return sampled * mask

    def with_food_perlin(self, threshold: float = 0.25, octaves: int = 8):
        self._channels["env_food"] = self._masked(
            self._perlin("env_food", octaves), 0.0, threshold)
        return self

    def with_chem(self, threshold: float = 0.1, octaves: int = 24):
        self._channels["chem1"] = self._masked(
            self._perlin("chem1", octaves), 0.0, threshold)
        return self

    def with_agents(self, ratio: float):
        u = round3(uniform01_from_bits(jr.bits(
            _site_key(self._key, "agents", 3), self._size, jnp.uint32)))
        occ = ((u > np.float32(0.0)) & (u <= np.float32(ratio)))
        self._channels["agents"] = occ.astype(jnp.float32)
        return self

    # ------------------------------------------------------------- builds
    def build_medium(self):
        rows = [None] * ch.NUM_MEDIUM_CHANNELS
        for name, idx in _CHANNEL_INDEX.items():
            rows[idx] = self._channels[name]
        return jnp.stack(rows)

    def build_env_state(self, max_agents: int | None = None) -> EnvState:
        medium = self.build_medium()
        agents = agents_from_medium(_site_key(self._key, "__agents__", 4),
                                    medium, max_agents)
        return EnvState(medium=medium, agents=agents,
                        flow_step=jnp.zeros((), jnp.int32))
