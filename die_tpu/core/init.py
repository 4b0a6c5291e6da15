"""State initialization — TPU twin of ``DataInitializer`` (core/data_init.py:92-253).

The reference builds the canonical start state as (core/env.py:74-83):
  * ``env_food``: Perlin noise masked to [0, threshold]  (with_food_perlin)
  * ``agents`` occupancy: cells where a rounded uniform lands in (0, ratio]
    (with_agents, core/data_init.py:222-226)
  * ``chem1``: zero
  * flat agent array extracted from occupancy in row-major cell order with
    alive=1 and agent_food ~ U(0.1, 1.0) rounded to 3 decimals
    (agents_from_medium, core/data_init.py:133-150)

All randomness follows the counter-based key contract (see core/rng.py);
the NumPy oracle (die_tpu/oracle) reproduces this bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.mathx import round3
from die_tpu.core.rng import uniform01_from_bits
from die_tpu.core.state import EnvState
from die_tpu.ops.perlin import lattice_gradients_jax, perlin_field


def build_medium(key, field_size, dynamics: Dynamics):
    """f32[3, W, H] initial medium."""
    W, H = field_size
    k_perlin = jr.fold_in(key, ch.TAG_INIT_PERLIN)
    k_occ = jr.fold_in(key, ch.TAG_INIT_OCCUPANCY)

    grads = lattice_gradients_jax(k_perlin, dynamics.init_food_octaves)
    p = perlin_field(grads, (W, H), dynamics.init_food_octaves)
    thr = np.float32(dynamics.init_food_threshold)
    food_mask = (p >= np.float32(0.0)) & (p <= thr)
    env_food = p * food_mask

    u = round3(uniform01_from_bits(jr.bits(k_occ, (W, H), jnp.uint32)))
    ratio = np.float32(dynamics.init_agent_ratio)
    occupancy = ((u > np.float32(0.0)) & (u <= ratio)).astype(jnp.float32)

    chem = jnp.zeros((W, H), jnp.float32)
    return jnp.stack([occupancy, env_food, chem])


def agents_from_medium(key, medium, max_agents: int | None = None):
    """f32[4, N] flat agent array from medium occupancy (row-major cell order)."""
    W, H = medium.shape[-2], medium.shape[-1]
    if max_agents is None:
        max_agents = W * H
    k_food = jr.fold_in(key, ch.TAG_INIT_AGENT_FOOD)

    occ_flat = medium[ch.CH_MED_AGENTS].reshape(-1) > np.float32(0.0)
    count = jnp.sum(occ_flat.astype(jnp.int32))
    (cell_idx,) = jnp.nonzero(occ_flat, size=max_agents, fill_value=0)
    ix = (cell_idx // H).astype(jnp.float32)
    iy = (cell_idx % H).astype(jnp.float32)
    slot = jnp.arange(max_agents, dtype=jnp.int32)
    alive = (slot < count).astype(jnp.float32)
    x = ix * np.float32(1.0 / (W - 1)) * alive
    y = iy * np.float32(1.0 / (H - 1)) * alive

    u = round3(uniform01_from_bits(jr.bits(k_food, (max_agents,), jnp.uint32)))
    agent_food = (np.float32(0.9) * u + np.float32(0.1)) * alive

    return jnp.stack([x, y, alive, agent_food])


def init_env_state(key, field_size, dynamics: Dynamics,
                   max_agents: int | None = None) -> EnvState:
    """Build the canonical start state (jittable; vmappable over keys)."""
    medium = build_medium(key, field_size, dynamics)
    agents = agents_from_medium(key, medium, max_agents)
    return EnvState(medium=medium, agents=agents,
                    flow_step=jnp.zeros((), jnp.int32))
