"""Fast-engine state init — same field recipe as the exact engine
(masked Perlin food, thresholded-uniform occupancy, core/data_init.py
semantics) plus lattice headings and on-grid agent food."""
from __future__ import annotations

import numpy as np

from die_tpu.core import channels as ch
from die_tpu.core.mathx import round3
from die_tpu.core.rng import (
    np_fold_in,
    np_random_bits,
    uniform01_from_bits,
)
from die_tpu.fast.config import NUM_DIRS, FastDynamics
from die_tpu.fast.env import FastEnvState
from die_tpu.ops.perlin import (
    lattice_gradients_jax,
    lattice_gradients_np,
    perlin_field,
)

TAG_INIT_DIR = 3
TAG_INIT_FOOD_GRID = 4


def _common(xp, perlin, u_occ, u_food, dir_bits, dyn: FastDynamics):
    thr = np.float32(dyn.init_food_threshold)
    env_food = perlin * ((perlin >= np.float32(0.0)) & (perlin <= thr))
    ratio = np.float32(dyn.init_agent_ratio)
    occ = ((u_occ > np.float32(0.0)) & (u_occ <= ratio)).astype(np.float32)
    dirf = (dir_bits & np.uint32(dyn.num_dirs - 1)).astype(np.float32) * occ
    agent_food = (np.float32(0.9) * u_food + np.float32(0.1)) * occ
    chem = xp.zeros_like(env_food)
    return FastEnvState(occ=occ, dir=dirf, agent_food=agent_food,
                        env_food=env_food, chem=chem,
                        flow_step=xp.zeros((), np.int32))


def fast_init_np(key: np.ndarray, field_size, dyn: FastDynamics) -> FastEnvState:
    W, H = field_size
    grads = lattice_gradients_np(np_fold_in(key, ch.TAG_INIT_PERLIN),
                                 dyn.init_food_octaves)
    p = perlin_field(grads, (W, H), dyn.init_food_octaves)
    u_occ = round3(uniform01_from_bits(np_random_bits(
        np_fold_in(key, ch.TAG_INIT_OCCUPANCY), (W, H))))
    u_food = round3(uniform01_from_bits(np_random_bits(
        np_fold_in(key, TAG_INIT_FOOD_GRID), (W, H))))
    dir_bits = np_random_bits(np_fold_in(key, TAG_INIT_DIR), (W, H))
    return _common(np, p, u_occ, u_food, dir_bits, dyn)


def fast_init_jax(key, field_size, dyn: FastDynamics) -> FastEnvState:
    import jax.numpy as jnp
    import jax.random as jr

    W, H = field_size
    grads = lattice_gradients_jax(jr.fold_in(key, ch.TAG_INIT_PERLIN),
                                  dyn.init_food_octaves)
    p = perlin_field(grads, (W, H), dyn.init_food_octaves)
    u_occ = round3(uniform01_from_bits(jr.bits(
        jr.fold_in(key, ch.TAG_INIT_OCCUPANCY), (W, H), jnp.uint32)))
    u_food = round3(uniform01_from_bits(jr.bits(
        jr.fold_in(key, TAG_INIT_FOOD_GRID), (W, H), jnp.uint32)))
    dir_bits = jr.bits(jr.fold_in(key, TAG_INIT_DIR), (W, H), jnp.uint32)
    return _common(jnp, p, u_occ, u_food, dir_bits, dyn)
