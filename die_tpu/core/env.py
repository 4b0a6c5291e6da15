"""Pure-functional environment step — TPU twin of ``Env.step`` (core/env.py:101-131).

Substep order is semantically significant and preserved exactly
(deposit happens *after* move so agents don't immediately sense their own
fresh trail — reference design note core/__init__.py:159-163):

  1. move            (core/env.py:163-176)
  2. deposit+layout  (core/env.py:204-215)
  3. feed            (core/env.py:220-243)
  4. lifecycle       (core/env.py:245-261)
  5. food flow       (core/env.py:147-150)
  6. diffuse+decay   (core/env.py:136-145)

Duplicate/collision semantics are pinned to the reference's observable
behavior (SURVEY §3-B ledger):
  * deposit scatter: when K alive agents share a cell, the chem gains exactly
    ONE deposit — the highest-slot-index agent's (numpy buffered fancy-index
    ``+=`` drops duplicates, last write wins; core/env.py:211).  Implemented
    here deterministically via a scatter-max "winner" index per cell.
  * feed gather: K co-located agents EACH gain the full ``rate_feed * food``
    of their cell while the field loses it once (core/env.py:223-228).
  * dead slots sit at (0,0), still gather cell (0,0) food and burn action
    costs (``only_alive=False`` at core/env.py:225).

Everything is fp32 with operation order pinned to match the NumPy oracle
(die_tpu/oracle/env.py) bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from die_tpu.core import channels as ch
from die_tpu.core.config import Boundary, Dynamics
from die_tpu.core.mathx import div, hypot2, tree_sum, wrap01
from die_tpu.core.state import EnvState, StepInfo
from die_tpu.ops.gaussian import separable_gaussian
from die_tpu.ops.waves import flow_time, wave_field

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)


def coords_to_cells(coord, size: int):
    """Float coord in [0,1] -> nearest cell index on the linspace(0,1,size)
    grid: round-half-up of ``c*(size-1)``, clipped (xarray ``method='nearest'``
    clamps out-of-range lookups — core/utils.py:53)."""
    scaled = coord * np.float32(size - 1) + np.float32(0.5)
    idx = jnp.floor(scaled).astype(jnp.int32)
    return jnp.clip(idx, 0, size - 1)


def agent_cells(agents, field_size):
    W, H = field_size
    ix = coords_to_cells(agents[ch.CH_AGT_X], W)
    iy = coords_to_cells(agents[ch.CH_AGT_Y], H)
    return ix, iy


def gather_field(field, ix, iy):
    """Per-agent nearest-cell gather (AgentIndexer.field_by_agents,
    core/utils.py:39-54).

    Default path is ``jnp.take``; ``die_tpu.ops.mxu_gather.use_mxu_gather``
    switches to the MXU one-hot formulation (bitwise-identical results,
    avoids XLA:TPU's serialized gather lowering)."""
    from die_tpu.ops.mxu_gather import mxu_gather_enabled, onehot_gather_flat

    H = field.shape[-1]
    flat = field.reshape(-1)
    cell = ix * H + iy
    if mxu_gather_enabled() and flat.shape[0] % 128 == 0:
        return onehot_gather_flat(flat, cell)
    return jnp.take(flat, cell)


def _move(dynamics: Dynamics, agents, action):
    """Substep 1 — core/env.py:163-176."""
    xy = agents[ch.CH_AGT_X : ch.CH_AGT_Y + 1]
    dxy = action[ch.CH_ACT_DX : ch.CH_ACT_DY + 1]
    new = xy + dxy
    if dynamics.boundary == Boundary.WRAP:
        new = wrap01(new)
    else:
        new = jnp.clip(new, _F0, _F1)
    return agents.at[ch.CH_AGT_X : ch.CH_AGT_Y + 1].set(new)


def _deposit_and_layout(dynamics: Dynamics, medium, agents, action):
    """Substep 2 — core/env.py:204-215.  Alive agents only.

    Winner-take-last duplicate semantics via a sort: agents sorted by cell
    with ascending slot order within a cell, so the last element of each
    equal-cell run is the highest-slot (numpy "last write wins") agent.
    Winners scatter to their cell, non-winners to distinct dummy slots past
    the field, making every scatter index unique — the fast parallel scatter
    path on TPU (the naive ``at[].max`` scatter lowers to a serialized loop,
    measured ~2x slower at 65536 agents).

    Two formulations, bitwise-identical results (same winner, same single
    addition into the chem field):
      * packed (default when cell and slot both fit 16 bits): one UNSTABLE
        2-operand sort on a unique u32 key ``cell<<16 | slot`` — stability
        (and XLA's hidden iota tiebreak operand) is unnecessary because the
        keys are unique and slot order rides in the low bits.  Dead slots
        sort into a pseudo-cell run at the top; when the field is exactly
        2^16 cells that run collides with the real last cell, whose winner
        is then resolved by a cheap side reduction.
      * stable (fallback for larger fields / slot counts): stable sort on
        the cell key with the deposit payload, dead slots at sentinel hw.
    """
    W, H = medium.shape[-2], medium.shape[-1]
    n = agents.shape[-1]
    ix, iy = agent_cells(agents, (W, H))
    alive = agents[ch.CH_AGT_ALIVE] > _F0
    cell = ix * H + iy
    hw = W * H
    deposit = action[ch.CH_ACT_DEPOSIT]
    slot = jnp.arange(n, dtype=jnp.int32)

    if hw <= (1 << 16) and n <= (1 << 16) \
            and not dynamics.force_stable_scatter:
        # ---- packed unique-key formulation ----
        pseudo = min(hw, (1 << 16) - 1)  # dead slots' pseudo-cell
        slot_u = slot.astype(jnp.uint32)
        key = jnp.where(
            alive,
            (cell.astype(jnp.uint32) << jnp.uint32(16)) | slot_u,
            (jnp.uint32(pseudo) << jnp.uint32(16)) | slot_u)
        sorted_key, sorted_dep = jax.lax.sort((key, deposit), num_keys=1,
                                              is_stable=False)
        sorted_cell = (sorted_key >> jnp.uint32(16)).astype(jnp.int32)
        # when hw == 2^16 the pseudo-cell run mixes dead slots with real
        # last-cell agents — exclude it here, resolve the cell on the side
        limit = hw if hw < (1 << 16) else hw - 1
        nxt = jnp.concatenate([sorted_cell[1:],
                               jnp.full((1,), -1, sorted_cell.dtype)])
        is_winner = (sorted_cell != nxt) & (sorted_cell < limit)

        from die_tpu.ops.mxu_scatter import (
            mxu_scatter_enabled,
            onehot_scatter_winner,
        )

        if mxu_scatter_enabled() and hw % 128 == 0:
            # MXU one-hot scatter: winner placement as byte-plane matmuls
            # (bit-identical to the at[].set path; avoids XLA:TPU's slow
            # scatter lowering — the dominant exact-engine cost)
            dense, count = onehot_scatter_winner(sorted_dep, sorted_cell,
                                                 is_winner, hw)
            chem = medium[ch.CH_MED_CHEM].reshape(-1) + dense
            occupancy = count
        else:
            target = jnp.where(is_winner, sorted_cell, hw + slot)
            dep_ext = jnp.zeros((hw + n,), jnp.float32).at[target].set(
                sorted_dep, mode="drop", unique_indices=True)
            occ_ext = jnp.zeros((hw + n,), jnp.float32).at[target].set(
                jnp.ones((n,), jnp.float32), mode="drop",
                unique_indices=True)
            chem = medium[ch.CH_MED_CHEM].reshape(-1) + dep_ext[:hw]
            occupancy = occ_ext[:hw]

        if hw == (1 << 16):
            # side-resolve the contested last cell: winner = max-slot alive
            # agent there; its deposit is added with the SAME single
            # addition the scatter path would have produced — medium + wdep
            # on the ORIGINAL chem value, with the winning deposit extracted
            # by bit pattern (u32 bitcast + max against 0) so -0.0 and NaN
            # payloads survive (a masked fp sum would fold -0.0 to +0.0).
            # Elementwise where-selection on the iota mask (no scalar
            # dynamic-update — that formulation hangs the XLA:CPU compiler
            # when composed with the sort+scatter graph); the untouched
            # lanes keep their exact bits because nothing is added to them.
            cond = alive & (cell == hw - 1)
            wslot = jnp.max(jnp.where(cond, slot, -1))
            dep_bits = jax.lax.bitcast_convert_type(deposit, jnp.uint32)
            wdep_bits = jnp.max(jnp.where(cond & (slot == wslot), dep_bits,
                                          jnp.uint32(0)))
            wdep = jax.lax.bitcast_convert_type(wdep_bits, jnp.float32)
            has = wslot >= 0
            is_last = jnp.arange(hw, dtype=jnp.int32) == hw - 1
            chem = jnp.where(is_last & has,
                             medium[ch.CH_MED_CHEM].reshape(-1) + wdep, chem)
            occupancy = jnp.where(
                is_last, jnp.where(has, _F1, _F0), occupancy)
    else:
        # ---- stable fallback ----
        # out-of-range sentinel for dead slots -> dropped by mode='drop'
        cell_masked = jnp.where(alive, cell, hw)
        sorted_cell, sorted_dep = jax.lax.sort((cell_masked, deposit),
                                               num_keys=1, is_stable=True)
        nxt = jnp.concatenate([sorted_cell[1:],
                               jnp.full((1,), -1, sorted_cell.dtype)])
        is_winner = (sorted_cell != nxt) & (sorted_cell < hw)
        target = jnp.where(is_winner, sorted_cell, hw + slot)

        dep_ext = jnp.zeros((hw + n,), jnp.float32).at[target].set(
            sorted_dep, mode="drop", unique_indices=True)
        occ_ext = jnp.zeros((hw + n,), jnp.float32).at[target].set(
            jnp.ones((n,), jnp.float32), mode="drop", unique_indices=True)
        chem = medium[ch.CH_MED_CHEM].reshape(-1) + dep_ext[:hw]
        occupancy = occ_ext[:hw]

    medium = medium.at[ch.CH_MED_CHEM].set(chem.reshape(W, H))
    medium = medium.at[ch.CH_MED_AGENTS].set(occupancy.reshape(W, H))
    return medium


def _action_cost(dynamics: Dynamics, action):
    """Per-slot burned energy — the reference's ``op_action_cost``
    (core/env.py:29-38): built-in linear/zero cost, or a registered custom
    operator when ``dynamics.cost_op`` names one (die_tpu.core.operators)."""
    if dynamics.cost_op is not None:
        from die_tpu.core.operators import get_cost_operator

        return get_cost_operator(dynamics.cost_op)(jnp, dynamics, action)
    if dynamics.zero_cost:
        return jnp.zeros_like(action[ch.CH_ACT_DEPOSIT])
    dist = hypot2(action[ch.CH_ACT_DX], action[ch.CH_ACT_DY])
    return (
        np.float32(dynamics.cost_weight_deposit) * jnp.abs(action[ch.CH_ACT_DEPOSIT])
        + np.float32(dynamics.cost_weight_dist) * dist
    )


def _feed(dynamics: Dynamics, medium, agents, action):
    """Substep 3 — core/env.py:220-243.  Returns (medium, agents, gained)."""
    W, H = medium.shape[-2], medium.shape[-1]
    env_food = medium[ch.CH_MED_FOOD]
    occupancy_mask = (medium[ch.CH_MED_AGENTS] > _F0).astype(jnp.float32)
    consumed_field = np.float32(dynamics.rate_feed) * env_food * occupancy_mask

    ix, iy = agent_cells(agents, (W, H))
    consumed = gather_field(consumed_field, ix, iy)  # ALL slots, incl. dead

    if not dynamics.food_infinite:
        medium = medium.at[ch.CH_MED_FOOD].set(env_food - consumed_field)

    burned = _action_cost(dynamics, action)
    gained = consumed - burned
    agents = agents.at[ch.CH_AGT_FOOD].set(agents[ch.CH_AGT_FOOD] + gained)
    return medium, agents, gained


def _lifecycle(dynamics: Dynamics, agents):
    """Substep 4 — core/env.py:245-261."""
    if dynamics.agents_die:
        have_food = agents[ch.CH_AGT_FOOD] > np.float32(1e-4)
        agents = jnp.where(have_food[None, :], agents, _F0)
    # agents_born: TODO in the reference too (core/env.py:256-261)
    return agents


def _resource_dynamics(dynamics: Dynamics, medium, flow_step):
    """Substep 5 — core/env.py:147-150."""
    if dynamics.flow.kind == "none":
        return medium, flow_step
    W, H = medium.shape[-2], medium.shape[-1]
    food = medium[ch.CH_MED_FOOD]
    if dynamics.flow.kind == "wave":
        t = flow_time(dynamics.flow, flow_step)
        f = wave_field((W, H), t)
        food = np.float32(dynamics.flow.scale) * f + (
            _F1 - np.float32(dynamics.flow.decay)
        ) * food
    elif dynamics.flow.kind == "perlin":
        from die_tpu.ops.waves import perlin_flow_field

        f = perlin_flow_field(dynamics.flow, (W, H), flow_step)
        food = np.float32(dynamics.flow.scale) * f + (
            _F1 - np.float32(dynamics.flow.decay)
        ) * food
    else:
        # registered custom flow operator (die_tpu.core.operators) — the
        # reference's arbitrary op_food_flow, applied to the whole field
        from die_tpu.core.operators import get_flow_operator

        food = get_flow_operator(dynamics.flow.kind)(
            jnp, dynamics.flow, food, flow_step)
    return medium.at[ch.CH_MED_FOOD].set(food), flow_step + 1


def _diffuse_decay(dynamics: Dynamics, medium):
    """Substep 6 — core/env.py:136-145."""
    chem = medium[ch.CH_MED_CHEM]
    diffused = separable_gaussian(chem, dynamics.diffuse_sigma,
                                  dynamics.diffuse_mode.value)
    diffused = diffused * (_F1 - np.float32(dynamics.rate_decay_chem))
    return medium.at[ch.CH_MED_CHEM].set(diffused)


def _feed_with_carry(dynamics: Dynamics, medium, agents, action):
    """Substep 3, fused-sense variant: gathers (env_food, occupancy) at the
    agents' cells through one shared one-hot and derives BOTH the consumed
    amount and the NEXT step's sensed food value — bitwise-equal to
    ``_feed`` + the next policy call's own food gather, because the gather
    moves exact bits and the per-agent expressions repeat the field-side
    arithmetic on the same bits:

      consumed_field[c] = (rate*e[c]) * occ[c]     (field, for the decrement)
      consumed_i        = (rate*e_g) * occ_g       (same ops, same bits)
      next_food[c]      = e[c] - consumed_field[c] (field)
      carry_i           = e_g - consumed_i         (same ops, same bits)

    Only valid when nothing between feed(t) and sense(t+1) can change the
    agent's cell or the food it would sense there — the caller
    (``env_step_carry``) gates on flow='none', agents_die=False, and
    apply_sense_mask=False.

    Returns (medium, agents, gained, sense_carry).
    """
    W, H = medium.shape[-2], medium.shape[-1]
    env_food = medium[ch.CH_MED_FOOD]
    occupancy_mask = (medium[ch.CH_MED_AGENTS] > _F0).astype(jnp.float32)
    consumed_field = np.float32(dynamics.rate_feed) * env_food * occupancy_mask

    ix, iy = agent_cells(agents, (W, H))
    cell = ix * H + iy
    from die_tpu.ops.mxu_gather import mxu_gather_enabled, onehot_gather_mixed

    if mxu_gather_enabled() and (W * H) % 128 == 0:
        (f_g,), (occ_g,) = onehot_gather_mixed(
            (env_food.reshape(-1),), (occupancy_mask.reshape(-1),), cell)
    else:
        f_g = jnp.take(env_food.reshape(-1), cell)
        occ_g = jnp.take(occupancy_mask.reshape(-1), cell)
    consumed = (np.float32(dynamics.rate_feed) * f_g) * occ_g

    if not dynamics.food_infinite:
        medium = medium.at[ch.CH_MED_FOOD].set(env_food - consumed_field)
        sense_carry = f_g - consumed
    else:
        sense_carry = f_g

    burned = _action_cost(dynamics, action)
    gained = consumed - burned
    agents = agents.at[ch.CH_AGT_FOOD].set(agents[ch.CH_AGT_FOOD] + gained)
    return medium, agents, gained, sense_carry


def fused_sense_ok(dynamics: Dynamics) -> bool:
    """Whether ``env_step_carry``'s sense carry is valid (see
    ``_feed_with_carry``): no flow, no deaths, no sense mask."""
    return (dynamics.flow.kind == "none" and not dynamics.agents_die
            and not dynamics.apply_sense_mask)


def env_step_carry(dynamics: Dynamics, state: EnvState, action):
    """``env_step`` that also returns the NEXT step's per-slot sensed-food
    values (the fused-sense rollout optimization: feed's gather and the
    next policy food gather share indices, so one mixed gather serves
    both — saves ~3 of the step's 17 MXU dot passes, docs/PERF.md round
    3).  Caller must check :func:`fused_sense_ok`."""
    assert fused_sense_ok(dynamics)
    from die_tpu.utils.profiling import named_scope

    with named_scope("die/move"):
        agents = _move(dynamics, state.agents, action)
    with named_scope("die/deposit_layout"):
        medium = _deposit_and_layout(dynamics, state.medium, agents, action)
    with named_scope("die/feed"):
        medium, agents, gained, carry = _feed_with_carry(dynamics, medium,
                                                         agents, action)
    with named_scope("die/diffuse_decay"):
        medium = _diffuse_decay(dynamics, medium)

    num_agents = jnp.sum((agents[ch.CH_AGT_ALIVE] > _F0).astype(jnp.int32))
    reward = tree_sum(gained)
    safe_n = jnp.where(num_agents > 0, num_agents, 1).astype(jnp.float32)
    mean_reward = jnp.where(num_agents > 0, div(reward, safe_n), _F0)
    info = StepInfo(reward=reward, num_agents=num_agents,
                    mean_reward=mean_reward, terminated=num_agents == 0)
    return (EnvState(medium=medium, agents=agents,
                     flow_step=state.flow_step), info, carry)


def env_step(dynamics: Dynamics, state: EnvState, action):
    """One full environment step.  Pure; jit with ``dynamics`` static.

    Each substep runs under a ``jax.named_scope`` (``die/...``) so device
    traces and XLA op profiles attribute time per substep — metadata only,
    zero runtime cost (utils/profiling.py)."""
    from die_tpu.utils.profiling import named_scope

    with named_scope("die/move"):
        agents = _move(dynamics, state.agents, action)
    with named_scope("die/deposit_layout"):
        medium = _deposit_and_layout(dynamics, state.medium, agents, action)
    with named_scope("die/feed"):
        medium, agents, gained = _feed(dynamics, medium, agents, action)
    with named_scope("die/lifecycle"):
        agents = _lifecycle(dynamics, agents)
    with named_scope("die/food_flow"):
        medium, flow_step = _resource_dynamics(dynamics, medium,
                                               state.flow_step)
    with named_scope("die/diffuse_decay"):
        medium = _diffuse_decay(dynamics, medium)

    num_agents = jnp.sum((agents[ch.CH_AGT_ALIVE] > _F0).astype(jnp.int32))
    reward = tree_sum(gained)
    safe_n = jnp.where(num_agents > 0, num_agents, 1).astype(jnp.float32)
    mean_reward = jnp.where(num_agents > 0, div(reward, safe_n), _F0)
    info = StepInfo(reward=reward, num_agents=num_agents,
                    mean_reward=mean_reward, terminated=num_agents == 0)
    return EnvState(medium=medium, agents=agents, flow_step=flow_step), info


def sense_mask(dynamics: Dynamics, medium):
    """Neighbourhood visibility mask — core/env.py:276-288."""
    if not dynamics.apply_sense_mask:
        return None
    from die_tpu.core.mathx import round3

    occ = medium[ch.CH_MED_AGENTS]
    blurred = separable_gaussian(occ, dynamics.sense_mask_sigma, "nearest")
    return jnp.ceil(round3(blurred))


def observe(dynamics: Dynamics, state: EnvState):
    """(agents, sensed_medium) observation — core/env.py:291-298."""
    mask = sense_mask(dynamics, state.medium)
    if mask is None:
        return state.agents, state.medium
    return state.agents, state.medium * mask[None, :, :]
