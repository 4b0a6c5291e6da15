"""Learnable lattice policies: parameterized turn rules for the fast engine.

The capability twin of the reference's learned agent (NeuralAutomataAgent —
a conv perception model trained by neuroevolution): here the fixed Jones
turn rule (argmax of three chem probes) is replaced by a parameterized
policy over local observations, trained by the JAX-native ES stack at
fast-engine throughput (~10^5 env-steps/s/chip vs ~10^2 for the flat-agent
NCA path).  Three kernel-resident families, selected by the params SHAPE
(make_turn_rule dispatch), plus the conv-NCA in fast/nca.py (XLA path):

LINEAR — per-cell features (all already materialized by the step):
    [probe_left, probe_fwd, probe_right, env_food, agent_food, chem]
Params: W f32[3, 6] + b f32[3] -> logits for {turn left, keep, turn right};
deterministic argmax with pinned tie-breaking (keep > left > right).

MLP (round 5) — per-cell 7-feature -> hidden hardtanh -> 3-logit network
(see the section below); the kernel-cheap NONLINEAR family.

WIDE MLP (round 5) — 13 features: the MLP plus two in-rule probe trios
(chem at 2*sense_dist, env_food at sense_dist, computed with the engine's
own sense machinery).  The repo's best forager: held-out 760.14 vs the
conv's 692.9 and tuned Jones' 653.6 under the pinned eval protocol —
trained COLD by full-covariance CMAES in ~45 s on one chip, then a
variance-halved 16-envs/eval warm CMAES leg (docs/ROADMAP.md round 5).

``fast_step`` accepts the rule through its ``turn_rule`` hook, so the
learned path shares every other substep (movement, deposit, feeding,
lifecycle, diffusion) with the classic engine — and the NumPy oracle runs
the identical code for bitwise verification.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from die_tpu.core.mathx import xp_of
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, fast_step

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)

NUM_FEATURES = 6
NUM_ACTIONS = 3  # left, keep, right


def init_turn_params(key):
    """Small-random init of (W, b) from the contract RNG."""
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core.rng import uniform01_from_bits

    bits = jr.bits(key, (NUM_ACTIONS, NUM_FEATURES + 1), jnp.uint32)
    u = uniform01_from_bits(bits)
    p = (np.float32(2.0) * u - _F1) * np.float32(0.1)
    # bias toward 'keep' so untrained agents still move coherently
    # (arithmetic one-hot: a scalar scatter_add segfaults XLA:CPU under the
    # verification flags that disable the algebraic simplifier)
    import jax

    row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    bump = ((row == 1) & (col == NUM_FEATURES)).astype(jnp.float32) \
        * np.float32(0.5)
    return p + bump  # f32[3, 7]: columns 0..5 weights, column 6 bias


def np_init_turn_params(key: np.ndarray) -> np.ndarray:
    from die_tpu.core.rng import np_random_bits, uniform01_from_bits

    u = uniform01_from_bits(
        np_random_bits(key, (NUM_ACTIONS, NUM_FEATURES + 1)))
    p = (np.float32(2.0) * u - _F1) * np.float32(0.1)
    p[1, NUM_FEATURES] += np.float32(0.5)
    return p


def jones_identity_params(keep_eps: float = 1e-6) -> np.ndarray:
    """The linear rule's exact Jones-mimic warm start: identity weights
    (l_left = left, l_keep = fwd + keep_eps, l_right = right) make
    make_turn_rule's decision chain reproduce the classic Jones argmax on
    strict orderings, with deterministic tie-keeping in place of Jones'
    random sign (the same measure-zero stand-in as fast/nca.py's
    jones_mimic_conv_params, which scores ABOVE random-tie Jones).
    ``keep_eps`` implements the ``fwd >=`` tie-to-keep; it must stay TINY:
    the linear logits compare raw chem values, so eps is a turn deadband
    in chem units (eps=0.01 swallowed the small gradients Jones acts on —
    select 113.9 vs 151.8 at 1e-6 vs Jones' 151.6; the conv mimic is
    immune because its gain-32 tanh amplifies differences first)."""
    p = np.zeros((NUM_ACTIONS, NUM_FEATURES + 1), np.float32)
    p[0, 0] = 1.0                      # l_left  = left probe
    p[1, 1] = 1.0                      # l_keep  = fwd probe
    p[1, NUM_FEATURES] = np.float32(keep_eps)
    p[2, 2] = 1.0                      # l_right = right probe
    return p


def make_turn_rule(params, dyn: FastDynamics | None = None):
    """turn_rule(xp, left, fwd, right, state) -> turn in {-1, 0, +1} f32.

    Dispatches on the (static) params shape — the one entry point every
    engine path uses (XLA scan, whole-field kernel, banded kernel, NumPy
    oracle), including Pallas SMEM Refs, which index like the array:
      rows == NUM_ACTIONS (f32[3, 7])   -> the LINEAR rule;
      cols == MLP_FEATURES_WIDE + 1     -> the WIDE per-cell MLP (13
                                           features incl. in-rule far-chem
                                           and food probe trios — needs
                                           ``dyn`` for the probe geometry);
      anything else (hidden + 3 rows)   -> the per-cell MLP (7 features).
    """
    if params.shape[0] == NUM_ACTIONS:
        return _make_linear_turn_rule(params)
    if params.shape[1] in (MLP_FEATURES_WIDE + 1, MLP_FEATURES_CTX + 1):
        if dyn is None:
            raise ValueError("the wide/ctx MLP families compute probe "
                             "trios in-rule and need the FastDynamics "
                             "(pass dyn=... to make_turn_rule)")
        return make_mlp_turn_rule(params, dyn=dyn)
    return make_mlp_turn_rule(params)


def _make_linear_turn_rule(params):
    def rule(xp, left, fwd, right, state: FastEnvState, bits):
        feats = (left, fwd, right, state.env_food, state.agent_food,
                 state.chem)
        logits = []
        for a in range(NUM_ACTIONS):
            acc = params[a, NUM_FEATURES] * _F1  # bias
            for f in range(NUM_FEATURES):
                acc = acc + params[a, f] * feats[f]
            logits.append(acc)
        l_left, l_keep, l_right = logits
        # pinned tie-breaking: keep >= left >= right
        m = xp.maximum(l_keep, l_left)
        turn = xp.where(l_right > m, -_F1,
                        xp.where(l_left > l_keep, _F1, _F0))
        return turn

    return rule


# ---------------------------------------------------------------------------
# Per-cell MLP turn rule (round 5): the kernel-cheap NONLINEAR rule family
# above the linear one — the capability the conv-NCA provides on the XLA
# path (matching the reference's flagship learnable agent,
# /root/reference/core/agent/evo.py:45-118), made kernel-resident.
#
# Architecture: features -> hidden (hardtanh) -> 3 logits, all per-cell
# affine maps whose weights ride in SMEM exactly like the linear rule — no
# rolls, no convs, so the in-kernel cost is ~hidden*(MLP_FEATURES+NUM_ACTIONS)
# FMA field passes (~90 for hidden=8) on top of the ~250-op step, vs the
# ~500 extra roll+FMA passes that kept the conv rule on the XLA path.
#
# The nonlinearity is HARDTANH (clip to [-1, 1], 2 elementwise ops), not
# the cephes tanh (~18 ops/field): ES training needs no smoothness or
# gradients, hardtanh keeps the bounded-saturating shape that makes the
# Jones-mimic warm start work, and hardtanh(0) == 0 EXACTLY (mathx.tanh(0)
# is ~6e-8), so all-tie cells keep without a keep_eps deadband.
# ---------------------------------------------------------------------------

MLP_FEATURES = 7  # left, fwd, right, occ, agent_food, env_food, chem
# The WIDE family (round 5b): the plain MLP plateaued at ~690 held-out —
# below the conv's 692.9 — suggesting missing spatial/feature context, so
# this family adds two more kernel-cheap probe trios computed IN-RULE
# with the engine's own sense machinery (probe_trio below):
#   [chem@S l/f/r, chem@2S l/f/r, env_food@S l/f/r,
#    occ, agent_food, env_food, chem]
MLP_FEATURES_WIDE = 13
# The CTX family (round 5c): wide + a true spatial receptive field — a
# per-channel (depthwise) 3x3 conv over the 7 base features, still
# kernel-lowerable (static rolls + FMAs, ~175 extra passes), appended as
# 7 more features.  Zeroed taps make it EXACTLY the wide rule, so the
# 755.96 record artifact embeds as a warm start (embed_wide_into_ctx).
MLP_FEATURES_CTX = 20  # wide 13 + 7 depthwise-conv outputs


def mlp_param_shape(hidden: int = 8):
    """One packed f32 param array (SMEM-friendly 2D, like the linear rule):
    rows 0..hidden-1 = layer-1 rows (MLP_FEATURES weights, bias at col
    MLP_FEATURES); rows hidden..hidden+2 = head rows for (left, keep,
    right) logits (hidden weights, bias at col ``hidden``).  Entries
    outside those slots are dead: zero-initialized and never read (ES
    perturbs them with no effect)."""
    shape = (hidden + NUM_ACTIONS, max(MLP_FEATURES + 1, hidden + 1))
    if shape[1] in (MLP_FEATURES_WIDE + 1, MLP_FEATURES_CTX + 1):
        raise ValueError(f"hidden={hidden} collides with the wide/ctx "
                         "shape signatures; pick another width")
    return shape


def mlp_wide_param_shape(hidden: int = 8):
    """Packed layout for the 13-feature wide MLP: layer-1 rows carry
    MLP_FEATURES_WIDE weights + bias at col 13 (cols are the family
    signature — see make_turn_rule); head rows as the plain MLP."""
    if hidden + 1 > MLP_FEATURES_WIDE + 1:
        raise ValueError("wide MLP supports hidden <= 13")
    return (hidden + NUM_ACTIONS, MLP_FEATURES_WIDE + 1)


def _mlp_live_mask(hidden: int, wide: bool = False) -> np.ndarray:
    if wide:
        m = np.zeros(mlp_wide_param_shape(hidden), np.float32)
        m[:hidden, :MLP_FEATURES_WIDE + 1] = 1.0
    else:
        m = np.zeros(mlp_param_shape(hidden), np.float32)
        m[:hidden, :MLP_FEATURES + 1] = 1.0
    m[hidden:, :hidden + 1] = 1.0
    return m


def init_mlp_params(key, hidden: int = 8, keep_bias: float = 0.5):
    """Small-random init from the contract RNG (dead slots zeroed); the
    keep-logit bias bump keeps untrained populations moving coherently —
    the same trick as the linear/conv inits."""
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core.rng import uniform01_from_bits

    shape = mlp_param_shape(hidden)
    u = uniform01_from_bits(jr.bits(key, shape, jnp.uint32))
    p = (np.float32(2.0) * u - _F1) * np.float32(0.1)
    p = p * jnp.asarray(_mlp_live_mask(hidden))
    import jax

    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    bump = ((row == hidden + 1) & (col == hidden)).astype(jnp.float32) \
        * np.float32(keep_bias)
    return p + bump


def np_init_mlp_params(key: np.ndarray, hidden: int = 8,
                       keep_bias: float = 0.5) -> np.ndarray:
    from die_tpu.core.rng import np_random_bits, uniform01_from_bits

    shape = mlp_param_shape(hidden)
    u = uniform01_from_bits(np_random_bits(key, shape))
    p = (np.float32(2.0) * u - _F1) * np.float32(0.1)
    p = p * _mlp_live_mask(hidden)
    p[hidden + 1, hidden] += np.float32(keep_bias)
    return p


def init_mlp_wide_params(key, hidden: int = 8, keep_bias: float = 0.5):
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core.rng import uniform01_from_bits

    shape = mlp_wide_param_shape(hidden)
    u = uniform01_from_bits(jr.bits(key, shape, jnp.uint32))
    p = (np.float32(2.0) * u - _F1) * np.float32(0.1)
    p = p * jnp.asarray(_mlp_live_mask(hidden, wide=True))
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    bump = ((row == hidden + 1) & (col == hidden)).astype(jnp.float32) \
        * np.float32(keep_bias)
    return p + bump


def np_init_mlp_wide_params(key: np.ndarray, hidden: int = 8,
                            keep_bias: float = 0.5) -> np.ndarray:
    from die_tpu.core.rng import np_random_bits, uniform01_from_bits

    shape = mlp_wide_param_shape(hidden)
    u = uniform01_from_bits(np_random_bits(key, shape))
    p = (np.float32(2.0) * u - _F1) * np.float32(0.1)
    p = p * _mlp_live_mask(hidden, wide=True)
    p[hidden + 1, hidden] += np.float32(keep_bias)
    return p


def mlp_ctx_param_shape(hidden: int = 8):
    """Packed layout for the 20-feature ctx family (cols == 21 is the
    family signature): rows 0..6 = depthwise 3x3 taps for the 7 base
    fields (9 taps du-major in cols 0..8); rows 7..7+hidden-1 = layer-1
    rows (20 weights, bias at col 20); last 3 rows = head rows (hidden
    weights, bias at col ``hidden``)."""
    if hidden + 1 > MLP_FEATURES_CTX + 1:
        raise ValueError("ctx MLP supports hidden <= 20")
    return (MLP_FEATURES + hidden + NUM_ACTIONS, MLP_FEATURES_CTX + 1)


def init_mlp_ctx_params(key, hidden: int = 8, keep_bias: float = 0.5):
    """Small-random init (taps included); dead slots zeroed."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core.rng import uniform01_from_bits

    shape = mlp_ctx_param_shape(hidden)
    u = uniform01_from_bits(jr.bits(key, shape, jnp.uint32))
    p = (np.float32(2.0) * u - _F1) * np.float32(0.1)
    mask = np.zeros(shape, np.float32)
    mask[:MLP_FEATURES, :9] = 1.0                       # depthwise taps
    mask[MLP_FEATURES:MLP_FEATURES + hidden, :] = 1.0   # layer-1 rows
    mask[MLP_FEATURES + hidden:, :hidden + 1] = 1.0     # head rows
    p = p * jnp.asarray(mask)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    bump = ((row == MLP_FEATURES + hidden + 1)
            & (col == hidden)).astype(jnp.float32) * np.float32(keep_bias)
    return p + bump


def embed_wide_into_ctx(wide_params: np.ndarray) -> np.ndarray:
    """Lift a wide-family params array into the ctx layout EXACTLY: taps
    and the 7 new feature weights start at zero, so the ctx rule computes
    the identical turn field — the 755.96 record artifact becomes a warm
    start with a strictly larger hypothesis space."""
    wide_params = np.asarray(wide_params, np.float32)
    hidden = wide_params.shape[0] - NUM_ACTIONS
    p = np.zeros(mlp_ctx_param_shape(hidden), np.float32)
    # layer-1: wide cols 0..12 are the same first 13 features; bias moves
    # from col 13 to col 20 (the 7 depthwise features sit in 13..19 at 0)
    p[MLP_FEATURES:MLP_FEATURES + hidden, :MLP_FEATURES_WIDE] = \
        wide_params[:hidden, :MLP_FEATURES_WIDE]
    p[MLP_FEATURES:MLP_FEATURES + hidden, MLP_FEATURES_CTX] = \
        wide_params[:hidden, MLP_FEATURES_WIDE]
    # head rows copy verbatim (weights cols 0..hidden-1, bias col hidden)
    p[MLP_FEATURES + hidden:, :hidden + 1] = \
        wide_params[hidden:, :hidden + 1]
    return p


def jones_mimic_mlp_wide_params(hidden: int = 8, gain: float = 32.0,
                                advance: float = 2.0, side: float = 1.0,
                                keep_eps: float = 0.0) -> np.ndarray:
    """The wide family's Jones-mimic warm start: identical to
    jones_mimic_mlp_params on the chem@S trio (features 0-2); the far and
    food trios start at exact zero for ES to grow."""
    if hidden < 3:
        raise ValueError("the Jones mimic needs >= 3 hidden units")
    p = np.zeros(mlp_wide_param_shape(hidden), np.float32)
    g = np.float32(gain)
    p[0, 0], p[0, 1] = g, -g
    p[1, 2], p[1, 1] = g, -g
    p[2, 0], p[2, 2] = g, -g
    a, c = np.float32(advance), np.float32(side)
    p[hidden + 0, 0] = a
    p[hidden + 0, 2] = c
    p[hidden + 1, hidden] = np.float32(keep_eps)
    p[hidden + 2, 1] = a
    p[hidden + 2, 2] = -c
    return p


def jones_mimic_mlp_params(hidden: int = 8, gain: float = 32.0,
                           advance: float = 2.0, side: float = 1.0,
                           keep_eps: float = 0.0) -> np.ndarray:
    """The MLP's Jones-mimic warm start — fast/nca.py's
    jones_mimic_conv_params recipe on the per-cell architecture: three
    hidden units read probe DIFFERENCES
      h0 = hardtanh(gain*(left - fwd)), h1 = hardtanh(gain*(right - fwd)),
      h2 = hardtanh(gain*(left - right))
    and the head forms l_left = advance*h0 + side*h2, l_keep = keep_eps,
    l_right = advance*h1 - side*h2.  With advance > side and the
    differences saturated this reproduces the Jones argmax on strict
    orderings; hardtanh(0) == 0 exactly, so all-tie cells keep even at
    keep_eps = 0 (the measure-zero tie states keep deterministically in
    place of Jones' random sign, as in both existing mimics).  Remaining
    hidden units start at exact zero for PGPE to grow."""
    if hidden < 3:
        raise ValueError("the Jones mimic needs >= 3 hidden units")
    p = np.zeros(mlp_param_shape(hidden), np.float32)
    g = np.float32(gain)
    p[0, 0], p[0, 1] = g, -g    # h0: left - fwd
    p[1, 2], p[1, 1] = g, -g    # h1: right - fwd
    p[2, 0], p[2, 2] = g, -g    # h2: left - right
    a, c = np.float32(advance), np.float32(side)
    p[hidden + 0, 0] = a        # l_left += a*h0
    p[hidden + 0, 2] = c        # l_left += c*h2
    p[hidden + 1, hidden] = np.float32(keep_eps)
    p[hidden + 2, 1] = a        # l_right += a*h1
    p[hidden + 2, 2] = -c       # l_right -= c*h2
    return p


def probe_trio(xp, field, dirf, n_dirs: int, dist: int):
    """(left, fwd, right) probes of ``field`` at ``dist`` cells along each
    cell's heading — the engine's sense-phase machinery (fast/env.py
    lowmem form: on-demand static rolls selected through the
    disjoint-complete ``dirf == d`` masks), exposed for learned rules
    that read EXTRA probe trios (the wide MLP).  Identical arithmetic on
    np / jnp / inside Mosaic kernels (static rolls; bounded live set)."""
    from die_tpu.fast.env import _offsets, _roll

    offsets = _offsets(n_dirs)
    W, H = field.shape
    fwd = xp.zeros((W, H), np.float32)
    left = xp.zeros((W, H), np.float32)
    right = xp.zeros((W, H), np.float32)
    for q in range(n_dirs):
        p = _roll(xp, field, (offsets[q][0] * dist, offsets[q][1] * dist))
        fwd = xp.where(dirf == np.float32(q), p, fwd)
        left = xp.where(dirf == np.float32((q - 1) % n_dirs), p, left)
        right = xp.where(dirf == np.float32((q + 1) % n_dirs), p, right)
    return left, fwd, right


def depthwise3x3(xp, field, params, row: int):
    """Depthwise 3x3 torus conv of one field with the 9 taps stored at
    ``params[row, 0:9]`` (du-major, du/dv in {-1, 0, 1}): ordered
    tap-by-tap accumulation of static rolls — identical on np / jnp /
    inside Mosaic kernels."""
    from die_tpu.fast.env import _roll

    acc = None
    k = 0
    for du in (-1, 0, 1):
        for dv in (-1, 0, 1):
            shifted = _roll(xp, field, (du, dv)) if (du or dv) else field
            term = params[row, k] * shifted
            acc = term if acc is None else acc + term
            k += 1
    return acc


def make_mlp_turn_rule(params, dyn: FastDynamics | None = None):
    """Per-cell MLP turn rule; ``params`` is the packed array (or SMEM Ref)
    of :func:`mlp_param_shape` / :func:`mlp_wide_param_shape` /
    :func:`mlp_ctx_param_shape` layout.  The wide/ctx layouts (``dyn``
    required) add in-rule probe trios (chem at 2*sense_dist, env_food at
    sense_dist); ctx further appends 7 depthwise-3x3 conv outputs over
    the base features."""
    cols = params.shape[1]
    wide = cols == MLP_FEATURES_WIDE + 1
    ctx = cols == MLP_FEATURES_CTX + 1
    n_feat = (MLP_FEATURES_CTX if ctx
              else MLP_FEATURES_WIDE if wide else MLP_FEATURES)
    dw_rows = MLP_FEATURES if ctx else 0
    hidden_n = params.shape[0] - NUM_ACTIONS - dw_rows

    def rule(xp, left, fwd, right, state: FastEnvState, bits):
        base7 = (left, fwd, right, state.occ, state.agent_food,
                 state.env_food, state.chem)
        feats = (left, fwd, right)
        if wide or ctx:
            far = probe_trio(xp, state.chem, state.dir, dyn.num_dirs,
                             2 * dyn.sense_dist)
            food = probe_trio(xp, state.env_food, state.dir, dyn.num_dirs,
                              dyn.sense_dist)
            feats = feats + far + food
        feats = feats + (state.occ, state.agent_food, state.env_food,
                         state.chem)
        if ctx:
            # depthwise context: taps in rows 0..6, one row per base field
            feats = feats + tuple(
                depthwise3x3(xp, base7[c], params, c)
                for c in range(MLP_FEATURES))
        hidden = []
        for h in range(hidden_n):
            r = dw_rows + h
            acc = params[r, n_feat] * _F1  # bias
            for f in range(n_feat):
                acc = acc + params[r, f] * feats[f]
            # hardtanh — explicit min/max (clip signatures differ np/jnp)
            hidden.append(xp.minimum(xp.maximum(acc, -_F1), _F1))
        logits = []
        for a in range(NUM_ACTIONS):
            r = dw_rows + hidden_n + a
            acc = params[r, hidden_n] * _F1  # bias
            for h in range(hidden_n):
                acc = acc + params[r, h] * hidden[h]
            logits.append(acc)
        l_left, l_keep, l_right = logits
        # pinned tie-breaking: keep >= left >= right (as the linear rule)
        m = xp.maximum(l_keep, l_left)
        return xp.where(l_right > m, -_F1,
                        xp.where(l_left > l_keep, _F1, _F0))

    return rule


def learned_fast_step(dyn: FastDynamics, params, state: FastEnvState, bits):
    return fast_step(dyn, state, bits,
                     turn_rule=make_turn_rule(params, dyn))


def learned_fast_rollout(dyn: FastDynamics, params, state: FastEnvState,
                         rollout_key, num_steps: int, t0: int = 0):
    import jax
    import jax.numpy as jnp

    from die_tpu.fast.rollout import jax_step_bits

    shape = state.occ.shape
    rule = make_turn_rule(params, dyn)

    def body(carry, t):
        st = carry
        bits = jax_step_bits(dyn, rollout_key, t, shape)
        st, reward, num = fast_step(dyn, st, bits, turn_rule=rule)
        return st, (reward, num)

    state, (rewards, nums) = jax.lax.scan(body, state,
                                          jnp.arange(num_steps) + t0)
    return state, rewards, nums


def learned_fast_rollout_auto(dyn: FastDynamics, params, state: FastEnvState,
                              rollout_key, num_steps: int, t0: int = 0,
                              num_inner: int | None = None):
    """Kernel-accelerated learned rollout (round 4): on TPU with a
    kernel-compatible geometry, runs the K-step VMEM-resident Pallas
    kernel with ``params`` riding as an SMEM operand — ONE compiled
    kernel serves the whole ES population (vmap over params adds a grid
    dim, no recompiles); fields above the VMEM budget route to the banded
    kernel.  Anywhere else: the XLA scan.  States are bitwise identical on
    every path (tests/test_pallas_learned.py; the turn rule is the same
    backend-generic function in all paths and in the NumPy oracle); the
    whole-field kernel's rewards are bitwise too, while the banded
    kernel's per-step reward carries the documented band-order fp32 fold
    (tests/test_banded.py).

    ``num_inner`` applies to the WHOLE-FIELD kernel only (steps fused per
    launch); the banded route runs its own per-launch schedule, exactly as
    fast_rollout_auto's does."""
    import jax

    W, H = state.occ.shape
    pow2_ok = (W & (W - 1)) == 0 and (H & (H - 1)) == 0 \
        and W >= 8 and H >= 128
    if jax.default_backend() == "tpu" and pow2_ok and num_steps > 0 \
            and dyn.flow.kind in ("none", "wave", "perlin"):
        if W * H <= 256 * 256:
            if num_inner is None:  # largest divisor of num_steps <= 256
                num_inner = num_steps
                while num_inner > 256 or num_steps % num_inner:
                    # num_steps is a rollout length (small int): walk down
                    num_inner -= 1
            if num_steps % num_inner == 0:
                from die_tpu.fast.pallas_step import (
                    pallas_fast_rollout_multi,
                )

                return pallas_fast_rollout_multi(
                    dyn, state, rollout_key, num_steps, num_inner=num_inner,
                    t0=t0, turn_params=params)
        else:  # large fields: banded kernel, same band budget as Jones
            from die_tpu.fast.pallas_step import pallas_banded_rollout
            from die_tpu.fast.rollout import banded_budget, choose_bands

            bands = choose_bands(dyn, W, H, banded_budget(dyn))
            if bands > 1:
                return pallas_banded_rollout(
                    dyn, state, rollout_key, num_steps, num_bands=bands,
                    t0=t0, turn_params=params)
    return learned_fast_rollout(dyn, params, state, rollout_key, num_steps,
                                t0=t0)


def oracle_learned_rollout(dyn: FastDynamics, params: np.ndarray,
                           state: FastEnvState, rollout_key: np.ndarray,
                           num_steps: int, t0: int = 0):
    from die_tpu.fast.rollout import np_step_bits

    rule = make_turn_rule(params, dyn)
    shape = state.occ.shape
    rewards = np.zeros(num_steps, np.float32)
    nums = np.zeros(num_steps, np.int32)
    for i in range(num_steps):
        bits = np_step_bits(dyn, rollout_key, t0 + i, shape)
        state, reward, num = fast_step(dyn, state, bits, turn_rule=rule)
        rewards[i] = reward
        nums[i] = num
    return state, rewards, nums


class LatticeTrainConfig(NamedTuple):
    field_size: tuple = (64, 64)
    epochs: int = 50
    epoch_iters: int = 50
    popsize: int = 16
    envs_per_eval: int = 2
    seed: int = 0


def _es_center(es_state):
    """The searcher-state field holding the distribution center: PGPE/
    OpenAIES carry ``center``, the CMA-ES family carries ``mean``."""
    return es_state.center if hasattr(es_state, "center") else es_state.mean


def train_lattice(dyn: FastDynamics, cfg: LatticeTrainConfig, log_fn=None,
                  mesh=None, mesh_axis="pop", checkpoint_dir=None,
                  checkpoint_every: int = 0, resume_from=None,
                  start_epoch: int = 0, params_init=None,
                  common_random_envs: bool = False,
                  radius_init: float = 0.5, searcher_fn=None):
    """Neuroevolution of the turn rule on the fast engine.

    ``checkpoint_dir``/``checkpoint_every``: periodic ES-state checkpoints
    (preemption-safe, like learn/train.py); ``resume_from``/``start_epoch``
    continue a run with the exact searcher state — epochs are keyed by
    index, so a resumed run replays the same generation stream.

    ``params_init``: optional params array to start the PGPE center at —
    its SHAPE selects the rule family (f32[3, 7] linear, default; an
    ``mlp_param_shape(hidden)`` array trains the per-cell MLP — both run
    inside the kernels).  E.g. ``jones_identity_params`` /
    ``jones_mimic_mlp_params`` — the warm starts that escape the keep-only
    local optimum on the 16-dir lattice.  ``common_random_envs``: evaluate
    every member of a generation on the same envs/bit streams (CRN
    variance reduction — the round-3 conv unlock).

    ``searcher_fn``: optional ``num_params -> searcher`` factory selecting
    the ES algorithm (any of learn/es.py's PGPE / OpenAIES / SepCMAES /
    full-covariance CMAES — they share the init/ask/tell protocol); the
    default is the PGPE+ClipUp configuration every committed artifact was
    trained with.  The round-5 searcher-axis sweeps (tools/sweep_mlp16.py)
    drive CMAES through this hook.

    Returns (best_params shaped like the init, es_state, history).
    """
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from jax.flatten_util import ravel_pytree

    from die_tpu.fast.init import fast_init_jax
    from die_tpu.learn.es import PGPE

    if params_init is not None:
        params0 = jnp.asarray(params_init, jnp.float32)
    else:
        params0 = init_turn_params(jr.PRNGKey(cfg.seed))
    flat0, unravel = ravel_pytree(params0)
    if searcher_fn is not None:
        searcher = searcher_fn(flat0.shape[0])
    else:
        searcher = PGPE(flat0.shape[0], popsize=cfg.popsize,
                        center_learning_rate=0.05, radius_init=radius_init,
                        max_speed=0.1)
    es_state = searcher.init(flat0)
    resumed_best = None
    if resume_from is not None:
        from die_tpu.utils.checkpoint import (
            load_training_best,
            load_training_state,
        )

        es_state = jax.tree.map(jnp.asarray,
                                load_training_state(resume_from, es_state))
        resumed_best = load_training_best(resume_from)

    from die_tpu.core.mathx import tree_sum

    def eval_member(flat_params, member_key):
        params = unravel(flat_params)

        def one_env(k):
            st = fast_init_jax(jr.fold_in(member_key, k), cfg.field_size, dyn)
            # auto: K-step Pallas kernel on TPU-compatible geometries
            # (bitwise-identical to the XLA scan — the population vmaps
            # over the kernel's SMEM params operand), XLA scan elsewhere
            _, rewards, _ = learned_fast_rollout_auto(
                dyn, params, st, jr.fold_in(member_key, 1000 + k),
                cfg.epoch_iters)
            # order-pinned fold: per-step rewards are bitwise across engine
            # paths, but a naive jnp.sum's reduce order is fusion-dependent
            # (XLA schedules it differently after a scan vs a kernel) —
            # tree_sum keeps fitness, and so the whole training trajectory,
            # bitwise-identical whichever path evaluated it
            return tree_sum(rewards)

        per_env = jax.vmap(one_env)(jnp.arange(cfg.envs_per_eval))
        return tree_sum(per_env) / np.float32(cfg.envs_per_eval)

    @jax.jit
    def generation(es_state, key):
        pop, eps = searcher.ask(es_state, jr.fold_in(key, 0))
        if common_random_envs:
            # one shared eval key per generation: every member sees the
            # same envs and bit streams, so fitness DIFFERENCES are exact
            member_keys = jnp.broadcast_to(
                jnp.asarray(jr.fold_in(key, 1)), (cfg.popsize, 2))
        else:
            member_keys = jax.vmap(
                lambda i: jr.fold_in(jr.fold_in(key, 1), i)
            )(jnp.arange(cfg.popsize))
        from die_tpu.learn.es import shard_population, unshard_population

        pop, member_keys = shard_population(mesh, mesh_axis, pop,
                                            member_keys)
        fitnesses = jax.vmap(eval_member)(pop, member_keys)
        # gather before tell: keeps the ES update's fp32 reductions in the
        # unsharded order (bitwise-identical training across mesh sizes)
        fitnesses, eps = unshard_population(mesh, fitnesses, eps)
        es_state = searcher.tell(es_state, eps, fitnesses)
        return es_state, fitnesses

    master = jr.PRNGKey(cfg.seed)
    history = []
    best_fit, best_center = -np.inf, np.asarray(_es_center(es_state))
    if resumed_best is not None:
        best_fit, best_center = resumed_best
    for epoch in range(start_epoch, cfg.epochs):
        es_state, fits = generation(es_state, jr.fold_in(master, epoch))
        m = {"epoch": epoch, "best": float(jnp.max(fits)),
             "mean": float(jnp.mean(fits))}
        history.append(m)
        if m["best"] > best_fit:
            best_fit = m["best"]
            best_center = np.asarray(_es_center(es_state))
        if log_fn:
            log_fn(epoch, m)
        if checkpoint_dir and checkpoint_every and \
                (epoch + 1) % checkpoint_every == 0:
            from die_tpu.utils.checkpoint import save_training_state

            save_training_state(checkpoint_dir, epoch, es_state, cfg,
                                best_fit=best_fit, best_center=best_center)
    return best_center.reshape(params0.shape), es_state, history
