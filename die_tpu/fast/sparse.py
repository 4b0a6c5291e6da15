"""Sparse (agent-list) lattice engine — the A/B counterpart of the
field-centric ``fast_step``.

Motivation (round-3 measurement): the field-centric kernel pays ~248
elementwise ops on EVERY cell of the 256x256 field while occupancy at the
benchmark ratio is ~15%.  This engine keeps agents as a compacted list
(cell index, heading, food) — the reference's own data layout
(/root/reference/core/env.py:204-243 operates on flat CxN agent arrays) —
and pays per-AGENT costs instead: gathers for sensing/feeding, scatters
for deposit/occupancy, and an arithmetic conflict resolution.  Field-wide
PDE work (deposit application, feed decrement, flow, diffusion) stays in
cheap elementwise field ops.

The dynamics are BITWISE-IDENTICAL to ``fast_step`` for the supported
scope (per-cell-priority murmur RNG, no deaths/births, classic Jones turn
rule — the headline benchmark config): the per-cell random stream is
recomputed per agent from the murmur counter hash of its cell index, the
turn comparisons see the same f32 chem values, and conflict resolution
reproduces the pull-based argmin exactly via a power-of-two trick:

    every alive agent scatter-ADDS 2^(15 - score) into its target cell
    (score = (d - priority(target)) mod n, distinct per target); an agent
    wins iff its target was empty and the accumulated value is < 2*its
    own term — i.e. its power of two is the leading bit, i.e. its score
    is the minimum.  Sums of <= 16 distinct powers of two are exact in
    f32 (and in the bf16-operand MXU dot with f32 accumulation).

Gathers/scatters route through the MXU one-hot formulations on TPU
(ops/mxu_gather.py, ops/mxu_scatter.py) and jnp.take / at[] ops elsewhere
— both exact, so parity holds on every backend
(tests/test_sparse_lattice.py).  Measured A/B vs the field-centric engine:
docs/PERF.md round 3.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from die_tpu.core.rng import murmur_finalize
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, _offsets
from die_tpu.ops.gaussian import separable_gaussian

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)


class SparseState(NamedTuple):
    cell: object       # i32[N] flat cell index (parked slots: 0, masked)
    dir: object        # i32[N] heading in {0..n-1}
    food: object       # f32[N] agent energy
    alive: object      # bool[N]
    occ: object        # f32[W, H] occupancy field (maintained each step)
    env_food: object   # f32[W, H]
    chem: object       # f32[W, H]
    flow_step: object  # i32[]


def _check_scope(dyn: FastDynamics):
    if dyn.rng_kind != "murmur" or not dyn.per_cell_priority \
            or dyn.agents_die or dyn.agents_born:
        raise NotImplementedError(
            "sparse engine scope: murmur RNG, per-cell priority, no "
            "deaths/births (the headline benchmark config)")


def from_fast(state: FastEnvState, capacity: int | None = None,
              pad_multiple: int = 512) -> SparseState:
    """Eager conversion (numpy): compact occupied cells row-major into the
    agent list, padded with parked (alive=False) slots."""
    occ = np.asarray(state.occ)
    W, H = occ.shape
    cells = np.flatnonzero(occ.reshape(-1) > 0).astype(np.int32)
    n = cells.shape[0]
    if capacity is None:
        capacity = -(-max(n, 1) // pad_multiple) * pad_multiple
    assert capacity >= n
    cell = np.zeros(capacity, np.int32)
    dirv = np.zeros(capacity, np.int32)
    food = np.zeros(capacity, np.float32)
    alive = np.zeros(capacity, bool)
    cell[:n] = cells
    dirv[:n] = np.asarray(state.dir).reshape(-1)[cells].astype(np.int32)
    food[:n] = np.asarray(state.agent_food).reshape(-1)[cells]
    alive[:n] = True
    return SparseState(cell=cell, dir=dirv, food=food, alive=alive,
                       occ=occ.copy(), env_food=np.asarray(state.env_food),
                       chem=np.asarray(state.chem),
                       flow_step=np.int32(state.flow_step))


def _use_mxu() -> bool:
    from die_tpu.ops.mxu_gather import mxu_gather_enabled

    return mxu_gather_enabled()


def _gather_f32(flat, idx):
    if _use_mxu() and flat.shape[0] % 128 == 0:
        from die_tpu.ops.mxu_gather import onehot_gather_flat

        return onehot_gather_flat(flat, idx)
    return jnp.take(flat, idx)


def _gather_smallint(flats, idx):
    if _use_mxu() and flats[0].shape[0] % 128 == 0:
        from die_tpu.ops.mxu_gather import onehot_gather_smallint

        return onehot_gather_smallint(flats, idx)
    return tuple(jnp.take(f, idx) for f in flats)


def _scatter_winner(values, cells, mask, hw: int):
    if _use_mxu() and hw % 128 == 0:
        from die_tpu.ops.mxu_scatter import onehot_scatter_winner

        return onehot_scatter_winner(values, cells, mask, hw)
    n = values.shape[0]
    target = jnp.where(mask, cells, hw + jnp.arange(n, dtype=cells.dtype))
    dense = jnp.zeros((hw + n,), jnp.float32).at[target].set(
        values, mode="drop", unique_indices=True)[:hw]
    count = jnp.zeros((hw + n,), jnp.float32).at[target].set(
        jnp.ones((n,), jnp.float32), mode="drop", unique_indices=True)[:hw]
    return dense, count


def _scatter_add_pow2(values, cells, mask, hw: int):
    if _use_mxu() and hw % 128 == 0:
        from die_tpu.ops.mxu_scatter import onehot_scatter_add_smallint

        return onehot_scatter_add_smallint(values, cells, mask, hw)
    # duplicate adds of distinct powers of two are exact in any order
    return jnp.zeros((hw,), jnp.float32).at[cells].add(
        jnp.where(mask, values, _F0), mode="drop")


def _sel_offsets(d, offs):
    """(oi, oj)[i] = offs[d[i]] — where-chain over the n-entry table (a
    jnp.take on a tiny table lowers to a serialized gather; n selects are
    pure VPU)."""
    oi = jnp.zeros_like(d)
    oj = jnp.zeros_like(d)
    for k, (a, b) in enumerate(offs):
        m = d == k
        if a:
            oi = jnp.where(m, a, oi)
        if b:
            oj = jnp.where(m, b, oj)
    return oi, oj


def sparse_step(dyn: FastDynamics, state: SparseState, k0, k1,
                flow_field=None):
    """One lattice step on the agent list.  ``k0``/``k1``: the step key's
    u32 words (``fold_in(rollout_key, t)``), matching ``jax_step_bits``.
    Returns (state, reward, num_agents) — bitwise-equal to ``fast_step``'s
    on the shared state (see module docstring for the reward's signed-zero
    caveat at empty cells)."""
    _check_scope(dyn)
    W, H = state.env_food.shape
    hw = W * H
    n = dyn.num_dirs
    offs = _offsets(n)
    cell, dirv, alive = state.cell, state.dir, state.alive
    row = cell // H
    col = cell % H

    # per-cell random bits: the murmur counter hash of the OWN cell index —
    # identical to jax_murmur_bits(key, shape) at that cell
    own_bits = murmur_finalize(
        murmur_finalize(cell.astype(jnp.uint32) ^ k0) ^ k1)

    # ---- 1. sense + turn (classic Jones rule, fast/env.py step 1) ----------
    S = dyn.sense_dist
    chem_flat = state.chem.reshape(-1)

    def probe_cells(doff):
        d = (dirv + doff) % n
        oi, oj = _sel_offsets(d, offs)
        pr = (row + S * oi) % W
        pc = (col + S * oj) % H
        return pr * H + pc

    pidx = jnp.concatenate([probe_cells(0), probe_cells(1),
                            probe_cells(n - 1)])
    probes = _gather_f32(chem_flat, pidx).reshape(3, -1)
    fwd, left, right = probes[0], probes[1], probes[2]
    keep = (fwd >= left) & (fwd >= right)
    rand_sign = (own_bits & np.uint32(1)).astype(jnp.int32) * 2 - 1
    turn = jnp.where(keep, 0,
                     jnp.where(left > right, 1,
                               jnp.where(right > left, -1, rand_sign)))
    dir2 = (dirv + turn + n) % n

    # ---- 2. move conflict resolution (pull-argmin via leading-bit sums) ----
    oi, oj = _sel_offsets(dir2, offs)
    tcell = ((row + oi) % W) * H + ((col + oj) % H)
    tgt_bits = murmur_finalize(
        murmur_finalize(tcell.astype(jnp.uint32) ^ k0) ^ k1)
    # priority carve mirrors fast/env.py::_carve_dir_bits
    if n == 16:
        r_t = ((tgt_bits >> np.uint32(1)) & np.uint32(15)).astype(jnp.int32)
    else:
        r_t = ((tgt_bits >> np.uint32(1)) & np.uint32(7)).astype(jnp.int32)
        if n == 4:
            r_t = r_t % 4
    score = (dir2 - r_t + n) % n
    v = (jnp.int32(1) << (15 - score)).astype(jnp.float32)
    contested = _scatter_add_pow2(v, tcell, alive, hw)
    # integers <= 65535: split into two exact-in-bf16 byte planes
    c_hi = jnp.floor(contested * np.float32(1.0 / 256.0))
    c_lo = contested - np.float32(256.0) * c_hi
    occ_t, lo_t, hi_t = _gather_smallint(
        (state.occ.reshape(-1), c_lo, c_hi), tcell)
    c_t = lo_t + np.float32(256.0) * hi_t
    win = alive & (occ_t == _F0) & (c_t < np.float32(2.0) * v)

    if n == 16:
        blk = ((own_bits >> np.uint32(5)) & np.uint32(15)).astype(jnp.int32)
    else:
        blk = ((own_bits >> np.uint32(4)) & np.uint32(7)).astype(jnp.int32) \
            & (n - 1)
    if dyn.randomize_on_block:
        dir3 = jnp.where(win, dir2, blk)
    else:
        dir3 = dir2
    new_cell = jnp.where(win, tcell, cell)

    # ---- 3+4. deposit mask + occupancy in ONE winner scatter, then field-
    # space deposit/feed arithmetic mirroring fast/env.py steps 3-4 exactly
    idle = np.float32(dyn.idle_deposit)
    depval = jnp.where(win, _F1, idle)
    dep_dense, occ_new = _scatter_winner(depval, new_cell, alive, hw)
    dep_mask = dep_dense.reshape(W, H)
    occ_new2d = occ_new.reshape(W, H)

    deposit_amt = np.float32(dyn.deposit_coef) * state.env_food * dep_mask
    chem = state.chem + deposit_amt

    consumed_field = np.float32(dyn.rate_feed) * state.env_food * occ_new2d
    env_food = state.env_food
    if not dyn.food_infinite:
        env_food = env_food - consumed_field

    # per-agent feed at the (pre-decrement) gathered food value; formulas
    # mirror the field engine's at occupied cells (x*1.0 == x exactly)
    e_at = _gather_f32(state.env_food.reshape(-1), new_cell)
    dep_i = np.float32(dyn.deposit_coef) * e_at * depval
    consumed_i = np.float32(dyn.rate_feed) * e_at
    winf = win.astype(jnp.float32)
    cost_i = (np.float32(dyn.cost_deposit) * dep_i
              + np.float32(dyn.cost_move) * winf)
    gained_i = jnp.where(alive, consumed_i - cost_i, _F0)
    food = state.food + gained_i

    # ---- 6. food flow (field arithmetic, fast/env.py step 6) ---------------
    flow_step = state.flow_step
    if dyn.flow.kind in ("wave", "perlin"):
        if flow_field is not None:
            f = flow_field
        else:
            from die_tpu.ops.waves import flow_field_any

            f = flow_field_any(dyn.flow, (W, H), flow_step)
        env_food = (np.float32(dyn.flow.scale) * f
                    + (_F1 - np.float32(dyn.flow.decay)) * env_food)
        flow_step = flow_step + 1
    elif dyn.flow.kind != "none":
        raise ValueError(dyn.flow.kind)

    # ---- 7. chem diffuse + decay -------------------------------------------
    chem = separable_gaussian(chem, dyn.diffuse_sigma, "wrap") \
        * (_F1 - np.float32(dyn.rate_decay_chem))

    # ---- reward: gains placed on the field, folded in the engine's pinned
    # row/column order.  Empty cells carry +0.0 here vs the field engine's
    # gained*occ signed zeros — identical unless every contribution is zero.
    from die_tpu.fast.env import tree_sum_2d

    gained_dense, _ = _scatter_winner(gained_i, new_cell, alive, hw)
    reward = tree_sum_2d(jnp, gained_dense.reshape(W, H))
    num_agents = jnp.sum(alive.astype(jnp.int32))

    new_state = SparseState(cell=new_cell, dir=dir3, food=food, alive=alive,
                            occ=occ_new2d, env_food=env_food, chem=chem,
                            flow_step=flow_step)
    return new_state, reward, num_agents


def sparse_rollout(dyn: FastDynamics, state: SparseState, rollout_key,
                   num_steps: int, t0: int = 0):
    """Fused scan rollout; same per-step key derivation as fast_rollout."""
    import jax.random as jr

    def body(carry, t):
        st = carry
        k_t = jnp.asarray(jr.fold_in(rollout_key, t), jnp.uint32)
        st, reward, num = sparse_step(dyn, st, k_t[0], k_t[1])
        return st, (reward, num)

    state, (rewards, nums) = jax.lax.scan(
        body, state, jnp.arange(num_steps) + t0)
    return state, rewards, nums


def to_field_views(state: SparseState):
    """Scatter the agent list back to (occ, dir_field, food_field) for
    comparison against FastEnvState (dir/food compared at occupied cells
    only — the field engine lets empty cells' values drift)."""
    W, H = state.env_food.shape
    hw = W * H
    dir_dense, _ = _scatter_winner(state.dir.astype(jnp.float32),
                                   state.cell, state.alive, hw)
    food_dense, _ = _scatter_winner(state.food, state.cell, state.alive, hw)
    return state.occ, dir_dense.reshape(W, H), food_dense.reshape(W, H)
