"""Independent naive oracle for the fast (lattice) engine.

Unlike ``die_tpu/fast/rollout.py::oracle_fast_rollout`` — which runs the SAME
``fast_step`` body on numpy and therefore only verifies XLA/Pallas lowering
fidelity — this module restates the lattice-step semantics from scratch in a
deliberately different structure, so a logic bug in ``die_tpu/fast/env.py``
(e.g. in the n-direction conflict loop) is machine-checkable:

  * agents live in a Python dict ``{(i, j): (heading, food)}``;
  * movement/birth conflict resolution is PUSH-based (each agent proposes a
    target, proposals are grouped per cell, the per-cell winner is chosen) —
    the engine is pull-based (per-cell argmin over rolled neighbor stencils);
  * every field update is a per-cell ``np.float32`` scalar loop;
  * diffusion is an explicit per-cell wrap-indexed tap loop;
  * the reward reduction is a scalar pairwise-fold restatement.

Shared with the engine, deliberately and only:
  * the RNG bit contract — the raw u32 fields of ``FastStepBits`` and their
    per-step derivation (``np_step_bits``) ARE the spec's random inputs;
  * the flow-field input generators (``ops/waves.flow_field_any``) — input
    fields pinned by their own vs-reference tests, not step logic;
  * the ``core/mathx`` transcendental contract kernels (tanh for the
    learned conv rule) — the arithmetic spec layer, contract-tested on its
    own in tests/test_mathx.py;
  * the ``FastEnvState``/``FastDynamics`` data containers (no logic).

All arithmetic is np.float32 scalar ops in the engine's pinned operation
order, so results are bitwise-equal to ``fast_step`` (verified in
tests/test_fast_naive.py over fuzzed 4/8/16-direction configs including
births, deaths, and flow).

Reference semantics being modeled: /root/reference/core/env.py:101-131
(substep order: move, deposit, feed, lifecycle, flow, diffuse) and
/root/reference/core/agent/gradient.py:138-219 (Physarum sense/turn/deposit),
as redesigned for the lattice (see die_tpu/fast/config.py module docstring).
"""
from __future__ import annotations

import numpy as np

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)
_HALF = np.float32(0.5)

# Direction offset tables, restated from the spec (counter-clockwise from
# East in (row, col) axes where rows grow southward; offsets[(d + n/2) % n]
# == -offsets[d]).  Independent transcription — a table error in
# die_tpu/fast/config.py would show up as a trajectory mismatch.
_OFFS_4 = ((0, 1), (-1, 0), (0, -1), (1, 0))  # E N W S
_OFFS_8 = ((0, 1), (-1, 1), (-1, 0), (-1, -1),
           (0, -1), (1, -1), (1, 0), (1, 1))  # E NE N NW W SW S SE
_OFFS_16 = ((0, 1), (-1, 2), (-1, 1), (-2, 1),
            (-1, 0), (-2, -1), (-1, -1), (-1, -2),
            (0, -1), (1, -2), (1, -1), (2, -1),
            (1, 0), (2, 1), (1, 1), (1, 2))  # Moore + knight, ~22.5 deg


def _offsets(n: int):
    return {4: _OFFS_4, 8: _OFFS_8, 16: _OFFS_16}[n]


def _bit_fields(bits: FastStepBits, n: int):
    """(turn, prio, block, birth) integer fields from the raw u32 contract.

    Layout restated from the FastStepBits spec: bit 0 = turn tiebreak; for
    n <= 8, 3-bit fields at 1-3 (priority), 4-6 (blocked re-heading, masked
    to n), 7-9 (birth direction, masked to n) — the priority field for n = 4
    is the 3-bit value folded mod 4; for n == 16, 4-bit fields at 1-4 / 5-8
    / 9-12.
    """
    r = bits.rand
    turn = (r & np.uint32(1)).astype(np.int64)
    if n == 16:
        prio = ((r >> np.uint32(1)) & np.uint32(15)).astype(np.int64)
        block = ((r >> np.uint32(5)) & np.uint32(15)).astype(np.int64)
        birth = ((r >> np.uint32(9)) & np.uint32(15)).astype(np.int64)
    else:
        prio = (((r >> np.uint32(1)) & np.uint32(7)).astype(np.int64)) % n
        block = ((r >> np.uint32(4)) & np.uint32(7)).astype(np.int64) % n \
            if n == 4 else \
            ((r >> np.uint32(4)) & np.uint32(7)).astype(np.int64)
        birth = ((r >> np.uint32(7)) & np.uint32(n - 1)).astype(np.int64)
    return turn, prio, block, birth


def _gauss_taps(sigma: float, truncate: float = 4.0):
    """skimage/scipy Gaussian taps restated: radius = int(truncate*sigma+.5),
    float64 exp weights normalized then cast to fp32.  The tap VALUES are a
    pinned contract constant (vs-scipy tested in tests/test_ops.py); the
    float64 derivation recipe is replicated exactly (np.exp's SIMD kernel can
    differ from math.exp by ulps, which could cross an f32 cast boundary)."""
    radius = int(truncate * float(sigma) + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (xs / float(sigma)) ** 2)
    w = w / w.sum()
    return [np.float32(v) for v in w], radius


def _fold_pairwise(vals):
    """Scalar restatement of the engine's pow2 pairwise fold: halve the list,
    adding element i to element i+n, until one value remains."""
    vals = list(vals)
    n = len(vals)
    while n > 1:
        n //= 2
        vals = [np.float32(vals[i] + vals[i + n]) for i in range(n)]
    return vals[0]


def naive_linear_turn(params):
    """Per-cell restatement of the learned LINEAR turn rule
    (die_tpu/fast/learned.py::make_turn_rule): ascending-order affine
    logits over (left, fwd, right, env_food, agent_food, chem) and the
    pinned keep>=left>=right tie-breaking."""
    params = np.asarray(params, np.float32)

    def fn(left, fwd, right, st: FastEnvState):
        W, H = left.shape
        feats = (left, fwd, right, np.asarray(st.env_food),
                 np.asarray(st.agent_food), np.asarray(st.chem))
        turn = np.zeros((W, H), np.float32)
        for i in range(W):
            for j in range(H):
                logits = []
                for a in range(3):
                    acc = np.float32(params[a, 6] * _F1)  # bias
                    for f in range(6):
                        acc = np.float32(
                            acc + np.float32(params[a, f] * feats[f][i, j]))
                    logits.append(acc)
                l_left, l_keep, l_right = logits
                m = max(l_keep, l_left)
                if l_right > m:
                    turn[i, j] = np.float32(-1.0)
                elif l_left > l_keep:
                    turn[i, j] = _F1
        return turn

    return fn


def naive_mlp_turn(params, dyn: FastDynamics | None = None):
    """Per-cell restatement of the learned MLP turn rule
    (die_tpu/fast/learned.py::make_mlp_turn_rule): ascending-order affine
    layer-1 rows, hardtanh as explicit scalar min/max, ascending-order
    head rows, and the pinned keep>=left>=right tie-breaking.

    Plain family: features (left, fwd, right, occ, agent_food, env_food,
    chem).  WIDE family (cols == 14; needs ``dyn``): two extra probe
    trios read directly at wrap-indexed offsets — chem at 2*sense_dist
    and env_food at sense_dist along each cell's heading (probe q feeds
    fwd at dir==q, left at dir==q-1, right at dir==q+1, exactly as the
    engine's sense machinery).  CTX family (cols == 21): wide plus 7
    depthwise-3x3 outputs — direct wrap-indexed 9-tap sums in the same
    du-major ordered fold as learned.depthwise3x3 (taps in rows 0..6)."""
    from die_tpu.fast.env import _offsets

    params = np.asarray(params, np.float32)
    wide = params.shape[1] == 14
    ctx = params.shape[1] == 21
    n_feat = 20 if ctx else 13 if wide else 7
    dw_rows = 7 if ctx else 0
    hidden_n = params.shape[0] - 3 - dw_rows

    def fn(left, fwd, right, st: FastEnvState):
        W, H = left.shape
        chem = np.asarray(st.chem)
        efood = np.asarray(st.env_food)
        dirf = np.asarray(st.dir)
        turn = np.zeros((W, H), np.float32)
        one = np.float32(1.0)
        if wide or ctx:
            offsets = _offsets(dyn.num_dirs)

            def probe(field, i, j, q, dist):
                o = offsets[q]
                return field[(i + o[0] * dist) % W, (j + o[1] * dist) % H]

        base7 = (left, fwd, right, np.asarray(st.occ),
                 np.asarray(st.agent_food), efood, chem)
        for i in range(W):
            for j in range(H):
                base = (left[i, j], fwd[i, j], right[i, j])
                if wide or ctx:
                    d = int(dirf[i, j])
                    n = dyn.num_dirs
                    s2, s1 = 2 * dyn.sense_dist, dyn.sense_dist
                    far = (probe(chem, i, j, (d + 1) % n, s2),
                           probe(chem, i, j, d, s2),
                           probe(chem, i, j, (d - 1) % n, s2))
                    food = (probe(efood, i, j, (d + 1) % n, s1),
                            probe(efood, i, j, d, s1),
                            probe(efood, i, j, (d - 1) % n, s1))
                    feats = base + far + food
                else:
                    feats = base
                feats = feats + (base7[3][i, j], base7[4][i, j],
                                 efood[i, j], chem[i, j])
                if ctx:
                    for c in range(7):
                        acc = None
                        k = 0
                        for du in (-1, 0, 1):
                            for dv in (-1, 0, 1):
                                v = np.float32(
                                    params[c, k]
                                    * base7[c][(i + du) % W, (j + dv) % H])
                                acc = v if acc is None else np.float32(
                                    acc + v)
                                k += 1
                        feats = feats + (acc,)
                hidden = []
                for h in range(hidden_n):
                    r = dw_rows + h
                    acc = np.float32(params[r, n_feat] * one)  # bias
                    for f in range(n_feat):
                        acc = np.float32(
                            acc + np.float32(params[r, f] * feats[f]))
                    hidden.append(np.minimum(np.maximum(acc, -one), one))
                logits = []
                for a in range(3):
                    r = dw_rows + hidden_n + a
                    acc = np.float32(params[r, hidden_n] * one)
                    for h in range(hidden_n):
                        acc = np.float32(
                            acc + np.float32(params[r, h] * hidden[h]))
                    logits.append(acc)
                l_left, l_keep, l_right = logits
                m = np.maximum(l_keep, l_left)
                if l_right > m:
                    turn[i, j] = np.float32(-1.0)
                elif l_left > l_keep:
                    turn[i, j] = _F1
        return turn

    return fn


def naive_conv_turn(params):
    """Per-cell restatement of the conv-NCA turn rule
    (die_tpu/fast/nca.py::make_conv_turn_rule): explicit wrap-indexed 3x3
    accumulation in the pinned ascending (out, in, du, dv) order, the
    shared tanh contract kernel, a 1x1 head with optional bias, and the
    pinned tie-breaking."""
    conv = np.asarray(params.conv, np.float32)     # [hidden, 7, 3, 3]
    head = np.asarray(params.head, np.float32)     # [3, hidden, 1, 1]
    bias = None if params.bias is None else np.asarray(params.bias,
                                                       np.float32)

    def fn(left, fwd, right, st: FastEnvState):
        from die_tpu.core.mathx import tanh

        W, H = left.shape
        feats = (left, fwd, right, np.asarray(st.occ),
                 np.asarray(st.agent_food), np.asarray(st.env_food),
                 np.asarray(st.chem))
        hidden_n, c_in, k, _ = conv.shape
        r = k // 2
        hidden = np.zeros((hidden_n, W, H), np.float32)
        for h in range(hidden_n):
            for i in range(W):
                for j in range(H):
                    acc = None
                    for c in range(c_in):
                        for du in range(k):
                            for dv in range(k):
                                v = np.float32(
                                    conv[h, c, du, dv]
                                    * feats[c][(i + du - r) % W,
                                               (j + dv - r) % H])
                                acc = v if acc is None else np.float32(
                                    acc + v)
                    hidden[h, i, j] = acc
        hidden = tanh(hidden)  # the shared transcendental contract kernel
        logits = []
        for a in range(3):
            acc = None
            for h in range(hidden_n):
                term = np.float32(head[a, h, 0, 0]) * hidden[h]
                acc = term if acc is None else acc + term
            if bias is not None:
                acc = acc + bias[a]
            logits.append(acc)
        l_left, l_keep, l_right = logits
        m = np.maximum(l_keep, l_left)
        return np.where(l_right > m, np.float32(-1.0),
                        np.where(l_left > l_keep, _F1, _F0)
                        ).astype(np.float32)

    return fn


def naive_fast_step(dyn: FastDynamics, state: FastEnvState,
                    bits: FastStepBits, turn_rule_naive=None):
    """One lattice step, naively.  Returns (FastEnvState, reward, num_agents).

    ``turn_rule_naive``: optional (left, fwd, right, state) -> turn field
    replacing the classic Jones rule (the engine's ``turn_rule`` hook) —
    see :func:`naive_linear_turn` / :func:`naive_conv_turn`.
    Field shapes must be powers of two (the reward fold contract)."""
    n = dyn.num_dirs
    offs = _offsets(n)
    W, H = state.occ.shape
    occ = np.asarray(state.occ)
    dirf = np.asarray(state.dir)
    agent_food = np.asarray(state.agent_food)
    env_food = np.asarray(state.env_food)
    chem = np.asarray(state.chem)

    turn_bit, prio_bits, block_bits, birth_bits = _bit_fields(bits, n)
    if dyn.per_cell_priority:
        prio = prio_bits  # per-cell random rotation
    else:
        rot = int(np.uint32(bits.prio_rot) & np.uint32(n - 1))
        prio = np.full((W, H), rot, np.int64)

    # ---- 1. sense + turn: every cell turns, occupied or not — empty
    # cells' headings drift too (they are engine state).  The per-cell
    # probe values are collected into fields first (learned rules read
    # the probe fields of NEIGHBOR cells through their convolution).
    S = dyn.sense_dist
    fwd_f = np.zeros((W, H), np.float32)
    left_f = np.zeros((W, H), np.float32)
    right_f = np.zeros((W, H), np.float32)
    for i in range(W):
        for j in range(H):
            d = int(dirf[i, j])

            def probe(dd):
                oi, oj = offs[dd % n]
                return chem[(i + S * oi) % W, (j + S * oj) % H]

            fwd_f[i, j] = probe(d)
            left_f[i, j] = probe(d + 1)
            right_f[i, j] = probe(d - 1)

    turned = np.zeros((W, H), np.float32)
    if turn_rule_naive is not None:
        t_field = turn_rule_naive(left_f, fwd_f, right_f, state)
        for i in range(W):
            for j in range(H):
                turned[i, j] = np.float32(
                    (int(dirf[i, j] + t_field[i, j])) % n)
    else:
        for i in range(W):
            for j in range(H):
                d = int(dirf[i, j])
                fwd, left, right = fwd_f[i, j], left_f[i, j], right_f[i, j]
                if fwd >= left and fwd >= right:
                    t = _F0
                elif left > right:
                    t = _F1
                elif right > left:
                    t = np.float32(-1.0)
                else:  # exact tie, not keep: random sign from the turn bit
                    t = np.float32(2.0) * np.float32(turn_bit[i, j]) - _F1
                turned[i, j] = np.float32((int(d + t)) % n)

    # ---- 2. move: push-based proposals, per-target winner by minimal
    # (d - priority[target]) mod n.  A proposal lands only on a PRE-move
    # empty cell; a blocked agent stays (optionally re-randomizing heading).
    agents = {}
    for i in range(W):
        for j in range(H):
            if occ[i, j] > 0:
                agents[(i, j)] = int(turned[i, j])

    proposals = {}  # target cell -> list of (score, src, d)
    for (i, j), d in agents.items():
        oi, oj = offs[d]
        tgt = ((i + oi) % W, (j + oj) % H)
        if tgt not in agents:  # target must be empty before the move phase
            score = (d - int(prio[tgt])) % n
            proposals.setdefault(tgt, []).append((score, (i, j), d))

    received = {}  # target -> (src, d)
    for tgt, cands in proposals.items():
        cands.sort()
        received[tgt] = (cands[0][1], cands[0][2])
    moved = {src for (src, _d) in received.values()}

    new_occ = np.zeros((W, H), np.float32)
    new_dir = np.zeros((W, H), np.float32)
    new_food = np.zeros((W, H), np.float32)
    was_received = np.zeros((W, H), bool)
    was_moved = np.zeros((W, H), bool)
    for i in range(W):
        for j in range(H):
            p = (i, j)
            if p in received:
                src, d = received[p]
                new_occ[p] = _F1
                new_dir[p] = np.float32(d)
                new_food[p] = agent_food[src]
                was_received[p] = True
            elif p in moved:
                new_occ[p] = _F0
                new_dir[p] = _F0
                new_food[p] = _F0
                was_moved[p] = True
            elif p in agents:  # blocked (its move was rejected or impossible)
                new_occ[p] = _F1
                new_dir[p] = np.float32(block_bits[p]) \
                    if dyn.randomize_on_block else turned[p]
                new_food[p] = agent_food[p]
            else:  # empty, nothing arrived: heading still drifts
                new_occ[p] = occ[p]
                new_dir[p] = turned[p]
                new_food[p] = agent_food[p]

    # ---- 2b. births: fertile post-move agents push a child proposal in
    # their random birth direction; per-cell winner as in movement (fresh
    # (d - priority) mod n scoring, post-move emptiness).
    if dyn.agents_born:
        b_proposals = {}  # child cell -> list of (score, parent, d)
        for i in range(W):
            for j in range(H):
                if new_occ[i, j] > 0 and \
                        new_food[i, j] > np.float32(dyn.birth_threshold):
                    d = int(birth_bits[i, j])
                    oi, oj = offs[d]
                    c = ((i + oi) % W, (j + oj) % H)
                    if new_occ[c] <= 0:
                        score = (d - int(prio[c])) % n
                        b_proposals.setdefault(c, []).append(
                            (score, (i, j), d))
        born = {}  # child cell -> (parent, d, parent_pre_food)
        for c, cands in b_proposals.items():
            cands.sort()
            born[c] = (cands[0][1], cands[0][2], new_food[cands[0][1]])
        spawned = {parent for (parent, _d, _f) in born.values()}
        # arithmetic mirrors the engine: parents halve first, then every
        # cell adds born * (child_food * 0.5); dir/occ via mul-add forms
        for p in spawned:
            new_food[p] = np.float32(new_food[p] * _HALF)
        for i in range(W):
            for j in range(H):
                p = (i, j)
                if p in born:
                    _parent, d, pre = born[p]
                    new_food[p] = np.float32(
                        new_food[p] + np.float32(_F1 * pre) * _HALF)
                    new_dir[p] = np.float32(
                        new_dir[p] * _F0 + np.float32(d) * _F1)
                    new_occ[p] = np.float32(new_occ[p] + _F1)
                else:
                    # the engine's whole-field mul-adds touch every cell:
                    # + 0*pre*0.5 adds +0.0 (flips -0.0), dir scales by 1
                    new_food[p] = np.float32(new_food[p] + _F0)
                    new_dir[p] = np.float32(new_dir[p] * _F1 + _F0)

    # ---- 3. deposit at pre-birth move markers: arrivals deposit in full,
    # vacated cells deposit nothing, idlers deposit the idle floor
    # (the reference's deposit-mask clip(0.1, 1) semantics,
    # /root/reference/core/agent/gradient.py:210-214)
    dep_c = np.float32(dyn.deposit_coef)
    idle = np.float32(dyn.idle_deposit)
    deposit_amt = np.zeros((W, H), np.float32)
    new_chem = np.zeros((W, H), np.float32)
    for i in range(W):
        for j in range(H):
            if was_received[i, j]:
                m = _F1
            elif was_moved[i, j]:
                m = _F0
            else:
                m = np.float32(occ[i, j] * idle)
            deposit_amt[i, j] = np.float32(
                np.float32(dep_c * env_food[i, j]) * m)
            new_chem[i, j] = np.float32(chem[i, j] + deposit_amt[i, j])

    # ---- 4. feed at post-birth occupancy; arrivals pay the move cost,
    # depositors pay proportional cost (reference core/env.py:220-243)
    rate = np.float32(dyn.rate_feed)
    c_dep = np.float32(dyn.cost_deposit)
    c_mov = np.float32(dyn.cost_move)
    new_env = np.zeros((W, H), np.float32)
    gained = np.zeros((W, H), np.float32)
    for i in range(W):
        for j in range(H):
            consumed = np.float32(
                np.float32(rate * env_food[i, j]) * new_occ[i, j])
            new_env[i, j] = env_food[i, j] if dyn.food_infinite \
                else np.float32(env_food[i, j] - consumed)
            recv = _F1 if was_received[i, j] else _F0
            cost = np.float32(np.float32(c_dep * deposit_amt[i, j])
                              + np.float32(c_mov * recv))
            g = np.float32(consumed - np.float32(cost * new_occ[i, j]))
            gained[i, j] = g
            new_food[i, j] = np.float32(new_food[i, j] + g)

    # ---- 5. lifecycle: starvation zeroes the cell (mul by survival mask)
    if dyn.agents_die:
        thr = np.float32(dyn.death_threshold)
        for i in range(W):
            for j in range(H):
                dead = np.float32(new_occ[i, j]) if new_food[i, j] <= thr \
                    else _F0
                surv = np.float32(_F1 - dead)
                new_occ[i, j] = np.float32(new_occ[i, j] * surv)
                new_dir[i, j] = np.float32(new_dir[i, j] * surv)
                new_food[i, j] = np.float32(new_food[i, j] * surv)

    # ---- 6. food flow (shared input-field generators; the applied update
    # is restated per cell)
    flow_step = int(state.flow_step)
    if dyn.flow.kind in ("wave", "perlin"):
        from die_tpu.ops.waves import flow_field_any

        f = np.asarray(flow_field_any(dyn.flow, (W, H),
                                      np.int32(flow_step)))
        s = np.float32(dyn.flow.scale)
        keep = np.float32(_F1 - np.float32(dyn.flow.decay))
        for i in range(W):
            for j in range(H):
                new_env[i, j] = np.float32(
                    np.float32(s * f[i, j])
                    + np.float32(keep * new_env[i, j]))
        flow_step += 1
    elif dyn.flow.kind != "none":
        # custom registered flow: the oracle hook calls the registered
        # oracle_fn restatement on the whole field (field-level contract —
        # there is no built-in per-cell form to restate)
        from die_tpu.core.operators import get_flow_operator

        new_env = np.asarray(get_flow_operator(dyn.flow.kind, oracle=True)(
            np, dyn.flow, new_env, np.int32(flow_step))).astype(np.float32)
        flow_step += 1

    # ---- 7. chem diffuse + decay: explicit separable wrap-tap loops
    # (axis 0 then axis 1, taps accumulated left to right), then decay
    taps, radius = _gauss_taps(dyn.diffuse_sigma)
    pass0 = np.zeros((W, H), np.float32)
    for i in range(W):
        for j in range(H):
            acc = np.float32(taps[0] * new_chem[(i - radius) % W, j])
            for k in range(1, len(taps)):
                acc = np.float32(acc + np.float32(
                    taps[k] * new_chem[(i - radius + k) % W, j]))
            pass0[i, j] = acc
    decay = np.float32(_F1 - np.float32(dyn.rate_decay_chem))
    out_chem = np.zeros((W, H), np.float32)
    for i in range(W):
        for j in range(H):
            acc = np.float32(taps[0] * pass0[i, (j - radius) % H])
            for k in range(1, len(taps)):
                acc = np.float32(acc + np.float32(
                    taps[k] * pass0[i, (j - radius + k) % H]))
            out_chem[i, j] = np.float32(acc * decay)

    # ---- reward: pairwise fold of gained*occ over rows, then columns
    gf = [[np.float32(gained[i, j] * new_occ[i, j]) for j in range(H)]
          for i in range(W)]
    row_folded = [_fold_pairwise([gf[i][j] for i in range(W)])
                  for j in range(H)]
    reward = _fold_pairwise(row_folded)
    num_agents = int(sum(1 for i in range(W) for j in range(H)
                         if new_occ[i, j] > 0))

    new_state = FastEnvState(occ=new_occ, dir=new_dir, agent_food=new_food,
                             env_food=new_env, chem=out_chem,
                             flow_step=np.int32(flow_step))
    return new_state, reward, num_agents


def naive_fast_rollout(dyn: FastDynamics, state: FastEnvState,
                       rollout_key: np.ndarray, num_steps: int, t0: int = 0,
                       turn_rule_naive=None):
    """Rollout via the naive step; RNG bits via the shared contract."""
    from die_tpu.fast.rollout import np_step_bits

    shape = np.asarray(state.occ).shape
    rewards = np.zeros(num_steps, np.float32)
    nums = np.zeros(num_steps, np.int32)
    for i in range(num_steps):
        bits = np_step_bits(dyn, rollout_key, t0 + i, shape)
        state, reward, num = naive_fast_step(dyn, state, bits,
                                             turn_rule_naive=turn_rule_naive)
        rewards[i] = reward
        nums[i] = num
    return state, rewards, nums
