"""Seeded NumPy oracle for the environment — the executable specification.

An independent, eager, pure-NumPy implementation of the exact step semantics in
SURVEY §3-B (reference core/env.py:101-131), used by the test suite to verify
the compiled TPU engine bit-for-bit at fp32.  It shares only the low-level
*specs* with the engine (the RNG bit contract in core/rng.py, the arithmetic
kernels in core/mathx.py, the tap weights/perlin/wave formulas in die_tpu/ops)
— the substep logic, masking, and scatter/gather are written separately so the
two implementations genuinely check each other.

Reference semantics pinned here (with reference locations):
  * duplicate-drop deposit scatter — numpy buffered fancy ``+=``, last write
    wins (core/env.py:211)
  * duplicate-gain feed gather; field decremented once per cell
    (core/env.py:223-228)
  * dead slots at (0,0) gather food and burn costs (core/env.py:225,231)
  * nearest-cell mapping round-half-up of c*(size-1), clipped
    (core/utils.py:53, core/data_init.py:100-101)
"""
from __future__ import annotations

import dataclasses

import numpy as np

from die_tpu.core import channels as ch
from die_tpu.core.config import Boundary, Dynamics
from die_tpu.core.mathx import div, hypot2, round3, tree_sum, wrap01
from die_tpu.core.rng import np_fold_in, np_random_bits, uniform01_from_bits
from die_tpu.ops.gaussian import separable_gaussian
from die_tpu.ops.perlin import lattice_gradients_np, perlin_field
from die_tpu.ops.waves import flow_time, wave_field

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)


@dataclasses.dataclass
class OracleState:
    medium: np.ndarray   # f32[3, W, H]
    agents: np.ndarray   # f32[4, N]
    flow_step: np.int32

    def copy(self) -> "OracleState":
        return OracleState(self.medium.copy(), self.agents.copy(),
                           np.int32(self.flow_step))


def cells_of(coord: np.ndarray, size: int) -> np.ndarray:
    scaled = coord * np.float32(size - 1) + np.float32(0.5)
    return np.clip(np.floor(scaled).astype(np.int32), 0, size - 1)


def oracle_init_state(key: np.ndarray, field_size, dynamics: Dynamics,
                      max_agents: int | None = None) -> OracleState:
    W, H = field_size
    if max_agents is None:
        max_agents = W * H

    grads = lattice_gradients_np(np_fold_in(key, ch.TAG_INIT_PERLIN),
                                 dynamics.init_food_octaves)
    p = perlin_field(grads, (W, H), dynamics.init_food_octaves)
    thr = np.float32(dynamics.init_food_threshold)
    env_food = p * ((p >= _F0) & (p <= thr))

    u_occ = round3(uniform01_from_bits(
        np_random_bits(np_fold_in(key, ch.TAG_INIT_OCCUPANCY), (W, H))))
    ratio = np.float32(dynamics.init_agent_ratio)
    occupancy = ((u_occ > _F0) & (u_occ <= ratio)).astype(np.float32)

    medium = np.stack([occupancy, env_food, np.zeros((W, H), np.float32)])

    # flat agent extraction, row-major cell order (core/data_init.py:133-150)
    ixs, iys = np.nonzero(occupancy > _F0)
    # more occupied cells than slots: keep the first max_agents in row-major
    # order (the jnp.nonzero(size=...) truncation semantics)
    ixs, iys = ixs[:max_agents], iys[:max_agents]
    count = ixs.shape[0]
    agents = np.zeros((4, max_agents), np.float32)
    agents[ch.CH_AGT_X, :count] = ixs.astype(np.float32) * np.float32(1.0 / (W - 1))
    agents[ch.CH_AGT_Y, :count] = iys.astype(np.float32) * np.float32(1.0 / (H - 1))
    agents[ch.CH_AGT_ALIVE, :count] = 1.0
    u_food = round3(uniform01_from_bits(
        np_random_bits(np_fold_in(key, ch.TAG_INIT_AGENT_FOOD), (max_agents,))))
    agents[ch.CH_AGT_FOOD, :count] = (np.float32(0.9) * u_food
                                      + np.float32(0.1))[:count]
    return OracleState(medium=medium, agents=agents, flow_step=np.int32(0))


def oracle_env_step(dynamics: Dynamics, state: OracleState, action: np.ndarray):
    """One step; mutates a copy.  Returns (new_state, reward, info)."""
    st = state.copy()
    medium, agents = st.medium, st.agents
    W, H = medium.shape[-2], medium.shape[-1]

    # 1. move
    new_xy = agents[0:2] + action[0:2]
    if dynamics.boundary == Boundary.WRAP:
        new_xy = wrap01(new_xy)
    else:
        new_xy = np.clip(new_xy, _F0, _F1)
    agents[0:2] = new_xy

    # 2. deposit & layout (alive only)
    alive = agents[ch.CH_AGT_ALIVE] > _F0
    ix = cells_of(agents[ch.CH_AGT_X], W)
    iy = cells_of(agents[ch.CH_AGT_Y], H)
    axc, ayc = ix[alive], iy[alive]
    chem = medium[ch.CH_MED_CHEM]
    # numpy buffered fancy-index +=: duplicates dropped, last write wins
    chem[axc, ayc] = chem[axc, ayc] + action[ch.CH_ACT_DEPOSIT][alive]
    medium[ch.CH_MED_AGENTS] = 0.0
    medium[ch.CH_MED_AGENTS][axc, ayc] = 1.0

    # 3. feed
    occupancy_mask = (medium[ch.CH_MED_AGENTS] > _F0).astype(np.float32)
    consumed_field = np.float32(dynamics.rate_feed) * medium[ch.CH_MED_FOOD] \
        * occupancy_mask
    consumed = consumed_field[ix, iy]  # ALL slots, including dead at (0,0)
    if not dynamics.food_infinite:
        medium[ch.CH_MED_FOOD] = medium[ch.CH_MED_FOOD] - consumed_field
    if dynamics.cost_op is not None:
        # registered custom cost operator — the oracle runs the independent
        # oracle_fn restatement when one was registered
        from die_tpu.core.operators import get_cost_operator

        burned = get_cost_operator(dynamics.cost_op, oracle=True)(
            np, dynamics, action)
    elif dynamics.zero_cost:
        burned = np.zeros_like(consumed)
    else:
        dist = hypot2(action[ch.CH_ACT_DX], action[ch.CH_ACT_DY])
        burned = (np.float32(dynamics.cost_weight_deposit)
                  * np.abs(action[ch.CH_ACT_DEPOSIT])
                  + np.float32(dynamics.cost_weight_dist) * dist)
    gained = consumed - burned
    agents[ch.CH_AGT_FOOD] = agents[ch.CH_AGT_FOOD] + gained

    # 4. lifecycle
    if dynamics.agents_die:
        have_food = agents[ch.CH_AGT_FOOD] > np.float32(1e-4)
        agents[:] = np.where(have_food[None, :], agents, _F0)

    # 5. food flow
    if dynamics.flow.kind in ("wave", "perlin"):
        if dynamics.flow.kind == "wave":
            t = flow_time(dynamics.flow, st.flow_step)
            f = wave_field((W, H), t)
        else:
            from die_tpu.ops.waves import perlin_flow_field

            f = perlin_flow_field(dynamics.flow, (W, H), st.flow_step)
        medium[ch.CH_MED_FOOD] = (np.float32(dynamics.flow.scale) * f
                                  + (_F1 - np.float32(dynamics.flow.decay))
                                  * medium[ch.CH_MED_FOOD])
        st.flow_step = np.int32(st.flow_step + 1)
    elif dynamics.flow.kind != "none":
        from die_tpu.core.operators import get_flow_operator

        medium[ch.CH_MED_FOOD] = get_flow_operator(
            dynamics.flow.kind, oracle=True)(
            np, dynamics.flow, medium[ch.CH_MED_FOOD], st.flow_step)
        st.flow_step = np.int32(st.flow_step + 1)

    # 6. diffuse & decay
    medium[ch.CH_MED_CHEM] = separable_gaussian(
        medium[ch.CH_MED_CHEM], dynamics.diffuse_sigma,
        dynamics.diffuse_mode.value
    ) * (_F1 - np.float32(dynamics.rate_decay_chem))

    num_agents = int(np.sum(agents[ch.CH_AGT_ALIVE] > _F0))
    reward = tree_sum(gained)
    info = {
        "num_agents": num_agents,
        "reward": reward,
        "mean_reward": div(reward, np.float32(num_agents)) if num_agents
        else _F0,
        "terminated": num_agents == 0,
    }
    return st, reward, info


def oracle_observe(dynamics: Dynamics, state: OracleState):
    """(agents, sensed_medium) — core/env.py:276-298."""
    if not dynamics.apply_sense_mask:
        return state.agents, state.medium
    occ = state.medium[ch.CH_MED_AGENTS]
    blurred = separable_gaussian(occ, dynamics.sense_mask_sigma, "nearest")
    mask = np.ceil(round3(blurred))
    return state.agents, state.medium * mask[None, :, :]
