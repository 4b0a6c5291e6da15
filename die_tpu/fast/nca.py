"""Conv-NCA lattice policy — the Neural-CA learned agent on the fast engine.

The production-engine analog of the reference's ``NeuralAutomataAgent``
(core/agent/evo.py:121-209): a small circular-padded conv stack reads the
local neighborhood of every cell and emits turn logits, replacing the fixed
Jones rule through the ``turn_rule`` hook.  Features per cell: the three
chem probes (left/fwd/right at sense_dist) plus the four state channels.

Architecture: 3x3 conv (7 -> hidden) -> tanh -> 1x1 conv (hidden -> 3),
deterministic argmax with pinned tie-breaking.  All roll/elementwise ops —
the same op set as the engine itself, trainable by ES at engine speed.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from die_tpu.core.mathx import tanh
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, fast_step
from die_tpu.ops.convops import circular_conv, xavier_uniform_bound

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)

NUM_FEATURES = 7  # left, fwd, right, occ, agent_food, env_food, chem


class ConvTurnParams(NamedTuple):
    conv: object  # f32[hidden, 7, 3, 3]
    head: object  # f32[3, hidden, 1, 1]
    bias: object = None  # f32[3] head bias (None = zeros; pre-r2 ckpts)


def init_conv_turn_params(key, hidden: int = 8,
                          keep_bias: float = 0.5) -> ConvTurnParams:
    """``keep_bias`` pre-loads the 'keep' logit so untrained populations
    still move coherently — the same trick that made the linear rule
    trainable (die_tpu/fast/learned.py init); round-1's bias-free conv
    plateaued at Jones parity."""
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core.rng import uniform01_from_bits

    def draw(k, shape, c_in, c_out, ksz):
        bound = xavier_uniform_bound(c_in, c_out, ksz)
        u = uniform01_from_bits(jr.bits(k, shape, jnp.uint32))
        return (np.float32(2.0) * u - _F1) * bound

    bias = jnp.asarray([0.0, keep_bias, 0.0], jnp.float32)
    return ConvTurnParams(
        conv=draw(jr.fold_in(key, 0), (hidden, NUM_FEATURES, 3, 3),
                  NUM_FEATURES, hidden, 3),
        head=draw(jr.fold_in(key, 1), (3, hidden, 1, 1), hidden, 3, 1),
        bias=bias,
    )


def np_init_conv_turn_params(key: np.ndarray, hidden: int = 8,
                             keep_bias: float = 0.5) -> ConvTurnParams:
    from die_tpu.core.rng import (
        np_fold_in,
        np_random_bits,
        uniform01_from_bits,
    )

    def draw(k, shape, c_in, c_out, ksz):
        bound = xavier_uniform_bound(c_in, c_out, ksz)
        u = uniform01_from_bits(np_random_bits(k, shape))
        return (np.float32(2.0) * u - _F1) * bound

    bias = np.asarray([0.0, keep_bias, 0.0], np.float32)
    return ConvTurnParams(
        conv=draw(np_fold_in(key, 0), (hidden, NUM_FEATURES, 3, 3),
                  NUM_FEATURES, hidden, 3),
        head=draw(np_fold_in(key, 1), (3, hidden, 1, 1), hidden, 3, 1),
        bias=bias,
    )


def jones_mimic_conv_params(hidden: int = 8, gain: float = 32.0,
                            advance: float = 2.0, side: float = 1.0,
                            keep_eps: float = 0.01) -> ConvTurnParams:
    """Hand-constructed conv-NCA weights that imitate the classic Jones
    argmax rule (fast/env.py turn phase; reference semantics
    /root/reference/core/agent/gradient.py:138-152) — the ES warm start
    the round-3 sweeps showed is required on the 16-dir lattice (cold
    CRN-ES collapses to the keep-only straight-runner, ROADMAP round 3).

    Three hidden units read only the center tap of the probe features:
      h0 = tanh(gain*(left - fwd)), h1 = tanh(gain*(right - fwd)),
      h2 = tanh(gain*(left - right))
    and the head forms
      l_left = advance*h0 + side*h2, l_keep = 0,
      l_right = advance*h1 - side*h2.
    With ``advance > side`` and tanh saturated, the decision chain in
    make_conv_turn_rule reproduces Jones exactly on strict orderings:
    fwd max -> both side logits <= side-advance < 0 = keep; left max ->
    l_left ~ advance+side beats both; right max symmetrically.  On exact
    ties it keeps, or turns left (left == right > fwd) instead of drawing
    Jones' random sign — deterministic stand-ins for measure-zero states.
    ``keep_eps`` is a small keep-logit bias that implements Jones'
    ``fwd >=`` tie-to-keep: mathx.tanh(0) is ~6e-8 (arithmetic-only
    approximation), so without it every all-tie cell would read a
    ~2e-7 left logit and spin.  Remaining hidden units and taps start
    at exact zero for PGPE to grow."""
    conv = np.zeros((hidden, NUM_FEATURES, 3, 3), np.float32)
    g = np.float32(gain)
    # feature order: 0=left, 1=fwd, 2=right (see NUM_FEATURES comment)
    conv[0, 0, 1, 1] = g
    conv[0, 1, 1, 1] = -g
    conv[1, 2, 1, 1] = g
    conv[1, 1, 1, 1] = -g
    conv[2, 0, 1, 1] = g
    conv[2, 2, 1, 1] = -g
    head = np.zeros((3, hidden, 1, 1), np.float32)
    a, c = np.float32(advance), np.float32(side)
    head[0, 0, 0, 0] = a   # l_left += a*h0
    head[0, 2, 0, 0] = c   # l_left += c*h2
    head[2, 1, 0, 0] = a   # l_right += a*h1
    head[2, 2, 0, 0] = -c  # l_right -= c*h2
    bias = np.asarray([0.0, keep_eps, 0.0], np.float32)
    return ConvTurnParams(conv=conv, head=head, bias=bias)


def make_conv_turn_rule(params: ConvTurnParams):
    def rule(xp, left, fwd, right, state: FastEnvState, bits):
        field = xp.stack([left, fwd, right, state.occ, state.agent_food,
                          state.env_food, state.chem])
        hiddenf = tanh(circular_conv(field, params.conv))
        logits = circular_conv(hiddenf, params.head)
        l_left, l_keep, l_right = logits[0], logits[1], logits[2]
        if params.bias is not None:
            l_left = l_left + params.bias[0]
            l_keep = l_keep + params.bias[1]
            l_right = l_right + params.bias[2]
        m = xp.maximum(l_keep, l_left)
        return xp.where(l_right > m, -_F1,
                        xp.where(l_left > l_keep, _F1, _F0))

    return rule


def conv_nca_rollout(dyn: FastDynamics, params: ConvTurnParams,
                     state: FastEnvState, rollout_key, num_steps: int,
                     t0: int = 0):
    import jax
    import jax.numpy as jnp

    from die_tpu.fast.rollout import jax_step_bits

    shape = state.occ.shape
    rule = make_conv_turn_rule(params)

    def body(carry, t):
        st = carry
        bits = jax_step_bits(dyn, rollout_key, t, shape)
        st, reward, num = fast_step(dyn, st, bits, turn_rule=rule)
        return st, (reward, num)

    state, (rewards, nums) = jax.lax.scan(body, state,
                                          jnp.arange(num_steps) + t0)
    return state, rewards, nums


def oracle_conv_nca_rollout(dyn: FastDynamics, params: ConvTurnParams,
                            state: FastEnvState, rollout_key: np.ndarray,
                            num_steps: int, t0: int = 0):
    from die_tpu.fast.rollout import np_step_bits

    rule = make_conv_turn_rule(params)
    shape = state.occ.shape
    rewards = np.zeros(num_steps, np.float32)
    nums = np.zeros(num_steps, np.int32)
    for i in range(num_steps):
        bits = np_step_bits(dyn, rollout_key, t0 + i, shape)
        state, reward, num = fast_step(dyn, state, bits, turn_rule=rule)
        rewards[i] = reward
        nums[i] = num
    return state, rewards, nums


def train_conv_nca(dyn: FastDynamics, cfg, hidden: int = 8, log_fn=None,
                   mesh=None, mesh_axis="pop", keep_bias: float = 0.5,
                   center_learning_rate: float = 0.05,
                   radius_init: float = 0.5, max_speed: float = 0.1,
                   common_random_envs: bool = False, params_init=None,
                   searcher_fn=None):
    """PGPE neuroevolution of the conv turn rule (cfg: LatticeTrainConfig).

    ``common_random_envs``: evaluate every population member of a
    generation on the SAME envs/rollout streams (fresh set each
    generation).  This is the classic common-random-numbers variance
    reduction for ES fitness comparisons — without it the ~3.7K-parameter
    conv rule optimizes evaluation noise (round-2 sweep: train_best ~330
    vs held-out ~265).  Off by default to keep earlier runs reproducible.

    ``params_init``: optional ConvTurnParams to start the PGPE center at
    (e.g. jones_mimic_conv_params — the warm start that escapes the
    keep-only local optimum on the 16-dir lattice); default is the
    xavier+keep-bias random init from cfg.seed.

    ``searcher_fn``: optional ``num_params -> searcher`` factory selecting
    the ES algorithm (learn/es.py's shared init/ask/tell protocol —
    e.g. full-covariance CMAES for the round-5 searcher-axis sweeps);
    default is the PGPE configuration above.
    """
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from jax.flatten_util import ravel_pytree

    from die_tpu.fast.init import fast_init_jax
    from die_tpu.learn.es import PGPE

    if params_init is not None:
        params0 = ConvTurnParams(*(jnp.asarray(p) for p in params_init))
    else:
        params0 = init_conv_turn_params(jr.PRNGKey(cfg.seed), hidden,
                                        keep_bias=keep_bias)
    flat0, unravel = ravel_pytree(tuple(params0))
    if searcher_fn is not None:
        searcher = searcher_fn(flat0.shape[0])
    else:
        searcher = PGPE(flat0.shape[0], popsize=cfg.popsize,
                        center_learning_rate=center_learning_rate,
                        radius_init=radius_init, max_speed=max_speed)
    es_state = searcher.init(flat0)

    def eval_member(flat_params, member_key):
        params = ConvTurnParams(*unravel(flat_params))

        def one_env(k):
            st = fast_init_jax(jr.fold_in(member_key, k), cfg.field_size, dyn)
            _, rewards, _ = conv_nca_rollout(
                dyn, params, st, jr.fold_in(member_key, 1000 + k),
                cfg.epoch_iters)
            return jnp.sum(rewards)

        return jnp.mean(jax.vmap(one_env)(jnp.arange(cfg.envs_per_eval)))

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
        return searcher.tell(es_state, eps, fitnesses), fitnesses

    from die_tpu.fast.learned import _es_center

    master = jr.PRNGKey(cfg.seed)
    history = []
    best_fit, best_center = -np.inf, np.asarray(_es_center(es_state))
    for epoch in range(cfg.epochs):
        es_state, fits = generation(es_state, jr.fold_in(master, epoch))
        m = {"epoch": epoch, "best": float(jnp.max(fits)),
             "mean": float(jnp.mean(fits))}
        history.append(m)
        if m["best"] > best_fit:
            best_fit = m["best"]
            best_center = np.asarray(_es_center(es_state))
        if log_fn:
            log_fn(epoch, m)
    best = ConvTurnParams(*ravel_pytree(tuple(params0))[1](
        jnp.asarray(best_center)))
    return best, es_state, history
