"""Pallas mega-kernel for the lattice engine: one whole env step fused into a
single VMEM-resident kernel.

Why: the XLA path materializes dozens of full-field intermediates per step
(probe rolls, candidate masks, payload pulls), so it is HBM-traffic-bound at
~47x the state size per step (measured).  This kernel keeps the five state
fields (256x256 f32 = 1.3 MB) plus all intermediates in VMEM and — crucially
— generates the per-cell random bits *inside* the kernel with the same
threefry2x32 cipher as the RNG contract (integer ops lower exactly), so the
trajectory stays bit-compatible with the NumPy oracle while the three
256 KB bit-fields per step never touch HBM.

Limitations of the kernel path (guarded): pow2 field sizes >= (8, 128).
Wave flow evaluates in-kernel (analytic, contract sincos); perlin flow
fields are precomputed outside (jax.random draws cannot lower in Mosaic)
and DMA'd in — both in the whole-field and the banded kernel.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from die_tpu.core.mathx import set_pallas_dynloop, set_pallas_trace
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits, fast_step

_ROT = ((13, 15, 26, 6), (17, 29, 16, 24))


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _threefry_bits_2d(k0, k1, shape):
    """threefry2x32 counter-mode bits over a 2D grid — bit-identical to
    ``np_random_bits(key, shape)`` (hi=0, lo=row-major flat iota, out=b0^b1).
    Pure u32 vector arithmetic; lowers inside Mosaic."""
    H = shape[1]
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x1 = row * np.uint32(H) + col  # lo word
    x0 = jnp.zeros(shape, jnp.uint32)  # hi word
    ks0 = k0
    ks1 = k1
    ks2 = ks0 ^ ks1 ^ np.uint32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)
    x0 = x0 + ks0
    x1 = x1 + ks1
    for i in range(5):
        for r in _ROT[i % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
    return x0 ^ x1


def _kernel_prio_rot(k0, k1):
    from die_tpu.core.rng import murmur_finalize

    return murmur_finalize(k0 ^ k1 ^ np.uint32(0x9E3779B9))


def _kernel_bits(dyn, k0, k1, shape):
    if dyn.rng_kind == "murmur":
        from die_tpu.core.rng import murmur_finalize

        H = shape[1]
        row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        counts = row * np.uint32(H) + col
        h = murmur_finalize(counts ^ k0)
        return murmur_finalize(h ^ k1)
    return _threefry_bits_2d(k0, k1, shape)


def _step_kernel(dyn: FastDynamics, keys_ref, flow_ref, occ_ref, dir_ref,
                 afood_ref, efood_ref, chem_ref, occ_o, dir_o, afood_o,
                 efood_o, chem_o, reward_o, num_o, flow_o):
    prev = set_pallas_trace(True)  # Mosaic-native rotates for xroll
    prev_dyn = set_pallas_dynloop(True)  # whole-field: looped 16-dir phases
    try:
        _step_kernel_body(dyn, keys_ref, flow_ref, occ_ref, dir_ref,
                          afood_ref, efood_ref, chem_ref, occ_o, dir_o,
                          afood_o, efood_o, chem_o, reward_o, num_o, flow_o)
    finally:
        set_pallas_trace(prev)
        set_pallas_dynloop(prev_dyn)


def _step_kernel_body(dyn: FastDynamics, keys_ref, flow_ref, occ_ref, dir_ref,
                      afood_ref, efood_ref, chem_ref, occ_o, dir_o, afood_o,
                      efood_o, chem_o, reward_o, num_o, flow_o):
    shape = occ_ref.shape
    bits = FastStepBits(
        rand=_kernel_bits(dyn, keys_ref[0], keys_ref[1], shape),
        prio_rot=None if dyn.per_cell_priority
        else _kernel_prio_rot(keys_ref[0], keys_ref[1]))
    state = FastEnvState(occ=occ_ref[:], dir=dir_ref[:],
                         agent_food=afood_ref[:], env_food=efood_ref[:],
                         chem=chem_ref[:], flow_step=flow_ref[0, 0])
    new_state, reward, num = fast_step(dyn, state, bits)
    occ_o[:] = new_state.occ
    dir_o[:] = new_state.dir
    afood_o[:] = new_state.agent_food
    efood_o[:] = new_state.env_food
    chem_o[:] = new_state.chem
    reward_o[0, 0] = reward
    num_o[0, 0] = num
    flow_o[0, 0] = new_state.flow_step


def make_pallas_step(dyn: FastDynamics, field_size, interpret: bool = False):
    """Returns jittable ``step(state, site_keys) -> (state, reward, num)``.

    ``site_keys``: u32[2] — the step key, fold_in(rollout_key, t).
    """
    if dyn.flow.kind == "perlin":
        raise NotImplementedError("perlin flow draws jax.random keys and "
                                  "runs on the XLA path, not in the kernel")
    if dyn.flow.kind not in ("none", "wave"):
        raise NotImplementedError(
            f"custom flow kind {dyn.flow.kind!r} cannot lower into the "
            "Mosaic kernel — use the XLA engine path")
    W, H = field_size
    if (W & (W - 1)) or (H & (H - 1)) or W < 8 or H < 128:
        raise ValueError("pallas step needs pow2 field sizes >= (8, 128)")

    field = jax.ShapeDtypeStruct((W, H), jnp.float32)
    kernel = partial(_step_kernel, dyn)

    def step(state: FastEnvState, site_keys):
        outs = pl.pallas_call(
            kernel,
            out_shape=(field, field, field, field, field,
                       jax.ShapeDtypeStruct((1, 1), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 5
            + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 3,
            interpret=interpret,
        )(site_keys, state.flow_step.reshape(1, 1), state.occ, state.dir,
          state.agent_food, state.env_food, state.chem)
        occ, dirf, afood, efood, chem, reward, num, flow = outs
        new_state = FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                                 env_food=efood, chem=chem,
                                 flow_step=flow[0, 0])
        return new_state, reward[0, 0], num[0, 0]

    return step


def _multi_step_kernel(dyn: FastDynamics, num_inner: int, keys_ref, flow_ref,
                       occ_ref, dir_ref, afood_ref, efood_ref, chem_ref,
                       occ_o, dir_o, afood_o, efood_o, chem_o, reward_o,
                       num_o, flow_o):
    """K fused steps with state resident in VMEM across all of them — HBM
    sees one read + one write of the five fields per K steps."""
    prev = set_pallas_trace(True)  # Mosaic-native rotates for xroll
    prev_dyn = set_pallas_dynloop(True)  # whole-field: looped 16-dir phases
    try:
        _multi_step_kernel_body(dyn, num_inner, keys_ref, flow_ref, occ_ref,
                                dir_ref, afood_ref, efood_ref, chem_ref,
                                occ_o, dir_o, afood_o, efood_o, chem_o,
                                reward_o, num_o, flow_o)
    finally:
        set_pallas_trace(prev)
        set_pallas_dynloop(prev_dyn)


def _multi_step_kernel_perlin(dyn: FastDynamics, num_inner: int, keys_ref,
                              flow_ref, fstack_ref, occ_ref, dir_ref,
                              afood_ref, efood_ref, chem_ref, occ_o, dir_o,
                              afood_o, efood_o, chem_o, reward_o, num_o,
                              flow_o, s_flow, fsem):
    prev = set_pallas_trace(True)
    prev_dyn = set_pallas_dynloop(True)  # whole-field: looped 16-dir phases
    try:
        _multi_step_kernel_body(dyn, num_inner, keys_ref, flow_ref, occ_ref,
                                dir_ref, afood_ref, efood_ref, chem_ref,
                                occ_o, dir_o, afood_o, efood_o, chem_o,
                                reward_o, num_o, flow_o,
                                fstack_ref=fstack_ref, s_flow=s_flow,
                                fsem=fsem)
    finally:
        set_pallas_trace(prev)
        set_pallas_dynloop(prev_dyn)


def _multi_step_kernel_learned(dyn: FastDynamics, num_inner: int, keys_ref,
                               flow_ref, tp_ref, occ_ref, dir_ref, afood_ref,
                               efood_ref, chem_ref, occ_o, dir_o, afood_o,
                               efood_o, chem_o, reward_o, num_o, flow_o):
    """K-step kernel with a learned turn rule (fast/learned.py): params
    ride in SMEM and are read as scalars inside the trace, so one compiled
    kernel serves every candidate — ES populations vmap over the params
    operand without recompiling.  The params SHAPE selects the family
    (make_turn_rule dispatch): f32[3, 7] = linear; f32[hidden+3, .] = the
    per-cell MLP (round 5 — nonlinear at ~90 extra FMA passes).  (The
    conv-NCA rule stays on the XLA path: its 3x3xC stacks would add ~500
    roll+FMA field passes per step in-kernel — ~3x the whole step — and
    XLA already fuses it.)"""
    prev = set_pallas_trace(True)
    prev_dyn = set_pallas_dynloop(True)
    try:
        _multi_step_kernel_body(dyn, num_inner, keys_ref, flow_ref, occ_ref,
                                dir_ref, afood_ref, efood_ref, chem_ref,
                                occ_o, dir_o, afood_o, efood_o, chem_o,
                                reward_o, num_o, flow_o, tp_ref=tp_ref)
    finally:
        set_pallas_trace(prev)
        set_pallas_dynloop(prev_dyn)


def _multi_step_kernel_perlin_learned(dyn: FastDynamics, num_inner: int,
                                      keys_ref, flow_ref, tp_ref, fstack_ref,
                                      occ_ref, dir_ref, afood_ref, efood_ref,
                                      chem_ref, occ_o, dir_o, afood_o,
                                      efood_o, chem_o, reward_o, num_o,
                                      flow_o, s_flow, fsem):
    prev = set_pallas_trace(True)
    prev_dyn = set_pallas_dynloop(True)
    try:
        _multi_step_kernel_body(dyn, num_inner, keys_ref, flow_ref, occ_ref,
                                dir_ref, afood_ref, efood_ref, chem_ref,
                                occ_o, dir_o, afood_o, efood_o, chem_o,
                                reward_o, num_o, flow_o,
                                fstack_ref=fstack_ref, s_flow=s_flow,
                                fsem=fsem, tp_ref=tp_ref)
    finally:
        set_pallas_trace(prev)
        set_pallas_dynloop(prev_dyn)


def _multi_step_kernel_body(dyn: FastDynamics, num_inner: int, keys_ref,
                            flow_ref, occ_ref, dir_ref, afood_ref, efood_ref,
                            chem_ref, occ_o, dir_o, afood_o, efood_o, chem_o,
                            reward_o, num_o, flow_o, fstack_ref=None,
                            s_flow=None, fsem=None, tp_ref=None):
    shape = occ_ref.shape
    turn_rule = None
    if tp_ref is not None:
        from die_tpu.fast.learned import make_turn_rule

        # a pl Ref indexes like the params array (scalar SMEM loads)
        turn_rule = make_turn_rule(tp_ref, dyn)

    def body(k, carry):
        occ, dirf, afood, efood, chem, flow_step = carry
        flow_field = None
        if fstack_ref is not None:
            # precomputed perlin flow field for this inner step (the jax
            # .random draws cannot lower in Mosaic — computed outside)
            c = pltpu.make_async_copy(fstack_ref.at[k], s_flow, fsem)
            c.start()
            c.wait()
            flow_field = s_flow[:]
        bits = FastStepBits(
            rand=_kernel_bits(dyn, keys_ref[k, 0], keys_ref[k, 1], shape),
            prio_rot=None if dyn.per_cell_priority
            else _kernel_prio_rot(keys_ref[k, 0], keys_ref[k, 1]))
        state = FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                             env_food=efood, chem=chem,
                             flow_step=flow_step)
        new_state, reward, num = fast_step(dyn, state, bits,
                                           turn_rule=turn_rule,
                                           flow_field=flow_field)
        reward_o[k, 0] = reward
        num_o[k, 0] = num
        return (new_state.occ, new_state.dir, new_state.agent_food,
                new_state.env_food, new_state.chem, new_state.flow_step)

    carry = (occ_ref[:], dir_ref[:], afood_ref[:], efood_ref[:], chem_ref[:],
             flow_ref[0, 0])
    occ, dirf, afood, efood, chem, flow_step = jax.lax.fori_loop(
        0, num_inner, body, carry)
    occ_o[:] = occ
    dir_o[:] = dirf
    afood_o[:] = afood
    efood_o[:] = efood
    chem_o[:] = chem
    flow_o[0, 0] = flow_step


def make_pallas_multi_step(dyn: FastDynamics, field_size, num_inner: int,
                           interpret: bool = False, learned: bool = False):
    """Returns jittable ``chunk(state, site_keys[K,2]) -> (state,
    rewards[K], nums[K])`` running K steps per kernel launch.

    Perlin flow: the K flow fields are precomputed outside the kernel
    (jax.random draws cannot lower in Mosaic; they are a function of
    flow_step only, shared across lockstep envs) and DMA'd in per step —
    applied update and trajectories are bitwise identical to the XLA path.

    ``learned=True``: chunk takes ``turn_params`` (a fast/learned.py
    params array — f32[3, 7] linear or mlp_param_shape(hidden) MLP; the
    shape selects the family) as an SMEM operand replacing the Jones
    rule — one compiled kernel serves every candidate, so ES populations
    vmap over it.
    """
    W, H = field_size
    if (W & (W - 1)) or (H & (H - 1)) or W < 8 or H < 128:
        raise ValueError("pallas step needs pow2 field sizes >= (8, 128)")
    if dyn.flow.kind not in ("none", "wave", "perlin"):
        raise NotImplementedError(
            f"custom flow kind {dyn.flow.kind!r} cannot lower into the "
            "Mosaic kernel — use the XLA engine path")

    perlin = dyn.flow.kind == "perlin"
    field = jax.ShapeDtypeStruct((W, H), jnp.float32)
    if perlin:
        kernel = partial(
            _multi_step_kernel_perlin_learned if learned
            else _multi_step_kernel_perlin, dyn, num_inner)
    else:
        kernel = partial(
            _multi_step_kernel_learned if learned else _multi_step_kernel,
            dyn, num_inner)

    def chunk(state: FastEnvState, site_keys, flow_stack=None,
              turn_params=None):
        if learned == (turn_params is None):
            raise ValueError("turn_params required iff learned=True")
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        args = [site_keys, state.flow_step.reshape(1, 1)]
        if learned:
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
            args += [turn_params]
        scratch = []
        if perlin:
            if flow_stack is None:
                raise ValueError(
                    "perlin flow needs the precomputed [K, W, H] flow_stack "
                    "(see pallas_fast_rollout_multi) — computed from the "
                    "chunk's global step indices so it stays unmapped "
                    "(shared) under vmap over envs")
            in_specs += [pl.BlockSpec(memory_space=pl.ANY)]
            args += [flow_stack]
            scratch = [pltpu.VMEM((W, H), jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        args += [state.occ, state.dir, state.agent_food, state.env_food,
                 state.chem]
        outs = pl.pallas_call(
            kernel,
            out_shape=(field, field, field, field, field,
                       jax.ShapeDtypeStruct((num_inner, 1), jnp.float32),
                       jax.ShapeDtypeStruct((num_inner, 1), jnp.int32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            in_specs=in_specs,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 5
            + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        occ, dirf, afood, efood, chem, rewards, nums, flow = outs
        new_state = FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                                 env_food=efood, chem=chem,
                                 flow_step=flow[0, 0])
        return new_state, rewards[:, 0], nums[:, 0]

    return chunk


def pallas_fast_rollout_multi(dyn: FastDynamics, state: FastEnvState,
                              rollout_key, num_steps: int,
                              num_inner: int = 8, t0: int = 0,
                              interpret: bool = False, turn_params=None):
    """Scan over K-step VMEM-resident kernel chunks (num_steps % K == 0).

    Perlin flow: the per-step flow fields are precomputed from the global
    step indices (requires the rollout invariant flow_step == t, which
    holds for any chain of these rollouts from a fresh init) — they depend
    only on time, so under vmap over envs the stack stays unmapped and is
    shared by every env's kernel.  The t0-based derivation is deliberate:
    deriving times from ``state.flow_step`` would map the stack under vmap
    (one [K, W, H] stack per env).  The invariant is checked here whenever
    ``state.flow_step`` is concrete; callers resuming a rollout must pass
    ``t0 = state.flow_step`` (fast_rollout_auto forwards its t0 the same
    way).
    """
    assert num_steps % num_inner == 0
    if dyn.flow.kind == "perlin" and \
            not isinstance(state.flow_step, jax.core.Tracer):
        fs = int(np.asarray(jax.device_get(state.flow_step)))
        if fs != int(t0):
            raise ValueError(
                f"perlin flow stack is precomputed from t0={t0} but "
                f"state.flow_step={fs}; resume with t0=state.flow_step or "
                f"the flow fields will be for the wrong times")
    chunk = make_pallas_multi_step(dyn, state.occ.shape, num_inner,
                                   interpret=interpret,
                                   learned=turn_params is not None)
    all_keys = jax.vmap(lambda t: site_keys_for_step(rollout_key, t))(
        jnp.arange(num_steps) + t0)
    chunked_keys = all_keys.reshape(num_steps // num_inner, num_inner, 2)

    if dyn.flow.kind == "perlin":
        from die_tpu.ops.waves import perlin_flow_field

        W, H = state.occ.shape
        ts = (jnp.arange(num_steps) + t0).reshape(num_steps // num_inner,
                                                  num_inner)

        def body(carry, xs):
            st = carry
            keys_k, ts_k = xs
            fstack = jax.vmap(lambda t: perlin_flow_field(
                dyn.flow, (W, H), t))(ts_k)
            st, rewards, nums = chunk(st, keys_k, fstack,
                                      turn_params=turn_params)
            return st, (rewards, nums)

        state, (rewards, nums) = jax.lax.scan(body, state,
                                              (chunked_keys, ts))
        return state, rewards.reshape(-1), nums.reshape(-1)

    def body(carry, keys_k):
        st = carry
        st, rewards, nums = chunk(st, keys_k, turn_params=turn_params)
        return st, (rewards, nums)

    state, (rewards, nums) = jax.lax.scan(body, state, chunked_keys)
    return state, rewards.reshape(-1), nums.reshape(-1)


def site_keys_for_step(rollout_key, t):
    """u32[2] step key for step t (the rollout RNG contract)."""
    return jr.fold_in(rollout_key, t)


def pallas_fast_rollout(dyn: FastDynamics, state: FastEnvState, rollout_key,
                        num_steps: int, t0: int = 0,
                        interpret: bool = False):
    """Fused scan over the pallas step (jit this; vmap over envs)."""
    step = make_pallas_step(dyn, state.occ.shape, interpret=interpret)

    def body(carry, t):
        st = carry
        st, reward, num = step(st, site_keys_for_step(rollout_key, t))
        return st, (reward, num)

    state, (rewards, nums) = jax.lax.scan(
        body, state, jnp.arange(num_steps) + t0)
    return state, rewards, nums


# --------------------------------------------------------------------------
# Banded kernel for large fields (>= 512x512): the 256x256 whole-field
# kernel saturates the 16 MB VMEM budget (docs/PERF.md), so bigger fields
# run a grid over row bands.  Each band DMAs its rows + a halo of
# halo_radius(dyn) rows (torus wrap) from HBM, runs the identical step body
# on the padded block, and writes back the center.  State fields are bitwise
# identical to the unsharded step (same argument as parallel/spatial.py:
# the halo covers one step's influence radius); the per-step reward is
# reduced band-wise (documented fp32 order divergence, as in the spatial
# path).


def _global_rows(shape, row0, total_rows):
    """u32 global row index per padded-block cell: (iota + row0) mod W."""
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + row0
    return jnp.where(row >= np.uint32(total_rows),
                     row - np.uint32(total_rows), row)


def _kernel_bits_banded(dyn, k0, k1, shape, row0, total_rows):
    """Same bit-fields as _kernel_bits but with global (wrapped) row counts,
    so banded blocks reproduce the unsharded per-cell streams exactly."""
    H = shape[1]
    row = _global_rows(shape, row0, total_rows)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    counts = row * np.uint32(H) + col
    if dyn.rng_kind == "murmur":
        from die_tpu.core.rng import murmur_finalize

        h = murmur_finalize(counts ^ k0)
        return murmur_finalize(h ^ k1)
    # threefry2x32 counter mode on the global counts (hi=0, lo=counts)
    x1 = counts
    x0 = jnp.zeros(shape, jnp.uint32)
    ks0, ks1 = k0, k1
    ks2 = ks0 ^ ks1 ^ np.uint32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)
    x0 = x0 + ks0
    x1 = x1 + ks1
    for i in range(5):
        for r in _ROT[i % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
    return x0 ^ x1


def make_pallas_banded_step(dyn: FastDynamics, field_size, num_bands: int,
                            batch: int = 1, num_inner: int = 1,
                            interpret: bool = False,
                            double_buffer: bool = True,
                            _debug: str = None, learned: bool = False):
    """Returns jittable ``chunk(state, site_keys[, flow_stack]) ->
    (state, rewards, nums)`` for fields too large for the whole-field VMEM
    kernel, over a lockstep batch of ``batch`` envs and ``num_inner`` fused
    steps per launch.

    State fields are ``f32[batch, W, H]``; ``site_keys`` is
    ``u32[batch, num_inner, 2]`` (per-env per-step keys, scalar-prefetched).
    The grid is (batch, num_bands): each program DMAs its band plus a
    ``num_inner * halo_radius(dyn)`` halo (torus wrap) from HBM, runs
    ``num_inner`` steps of the identical step body on the padded block
    (the valid region shrinks by one influence radius per step, always
    covering the band), and writes back the center.  Returns per-env
    per-inner-step rewards ``f32[batch, num_inner]`` (band-order fp32
    fold — documented divergence, as in parallel/spatial.py) and agent
    counts ``i32[batch, num_inner]``.

    Wave/perlin flow: the caller precomputes ``flow_stack`` —
    ``f32[num_inner, W, H]``, the flow fields F(flow_step + k) shared by
    every env of the lockstep batch (see pallas_banded_rollout_batch,
    which derives the times from the carried ``state.flow_step``, so
    resumed rollouts are handled) — and the kernel DMAs each inner step's
    padded rows alongside the state halo.  Results are bitwise identical
    to the XLA path (the applied update is the same arithmetic).

    Requirements: W % num_bands == 0, pow2 field sizes >= (8, 128).
    """
    from die_tpu.parallel.spatial import halo_radius

    W, H = field_size
    if (W & (W - 1)) or (H & (H - 1)) or W < 8 or H < 128:
        raise ValueError("banded step needs pow2 field sizes >= (8, 128)")
    if W % num_bands:
        raise ValueError("W must divide into num_bands")
    Wb = W // num_bands
    K = num_inner
    if dyn.flow.kind not in ("none", "wave", "perlin"):
        raise NotImplementedError(
            f"custom flow kind {dyn.flow.kind!r} cannot lower into the "
            "Mosaic kernel — use the XLA engine path")
    has_flow = dyn.flow.kind != "none"
    # DMA slices must be aligned to the 8-row sublane tiling: round the
    # K-step halo up to a multiple of 8 (extra rows are a wider margin)
    r = -(-(halo_radius(dyn) * K) // 8) * 8
    if W - Wb < 2 * r:
        raise ValueError(f"padded band ({Wb}+2*{r}) exceeds the field; use "
                         f"fewer bands or fewer inner steps")
    if Wb % 8:
        raise ValueError(f"band height {Wb} must be a multiple of 8")
    Wp = Wb + 2 * r
    B = batch
    # _debug: overhead-attribution variants for tools/bench_banded2.py —
    # 'nocompute' skips the step body (measures DMA + grid machinery);
    # 'nodma' only copies on the first grid step (measures compute + grid).
    skip_compute = _debug in ("nocompute", "grid")
    skip_dma = _debug in ("nodma", "grid")

    def kernel(keys_ref, *rest):
        # scalar-prefetch order: site_keys[, turn_params]; then operands
        if learned:
            tp_ref, flow_in, *refs = rest
        else:
            tp_ref = None
            flow_in, *refs = rest
        if has_flow:
            fstack_h = refs[0]
            refs = refs[1:]
        (occ_h, dir_h, afood_h, efood_h, chem_h,
         occ_o, dir_o, afood_o, efood_o, chem_o, reward_o, num_o, flow_o,
         s_occ, s_dir, s_afood, s_efood, s_chem) = refs[:18]
        rest = refs[18:]
        if has_flow:
            s_flow, sems, fsems = rest
        else:
            sems, = rest
        prev = set_pallas_trace(True)
        try:
            e = pl.program_id(0)
            b = pl.program_id(1)
            start = pl.multiple_of(b * Wb, 8)
            top = pl.multiple_of(jax.lax.rem(start - r + W, W), 8)
            bot = pl.multiple_of(jax.lax.rem(start + Wb, W), 8)
            slices = ((top, 0, r), (start, r, Wb), (bot, r + Wb, r))

            srcs = (occ_h, dir_h, afood_h, efood_h, chem_h)
            dsts = (s_occ, s_dir, s_afood, s_efood, s_chem)
            if double_buffer:
                # two scratch buffers: wait for the block DMA'd by the
                # PREVIOUS grid iteration, prefetch the NEXT band's block
                # into the other buffer before computing, so HBM->VMEM
                # transfer overlaps the step compute (VERDICT r1 next #4)
                def band_slices(b_i):
                    st = pl.multiple_of(b_i * Wb, 8)
                    tp = pl.multiple_of(jax.lax.rem(st - r + W, W), 8)
                    bt = pl.multiple_of(jax.lax.rem(st + Wb, W), 8)
                    return ((tp, 0, r), (st, r, Wb), (bt, r + Wb, r))

                def copies_for(e_i, b_i, buf):
                    cps = []
                    for i, (src, dst) in enumerate(zip(srcs, dsts)):
                        for j, (s0, d0, n) in enumerate(band_slices(b_i)):
                            cps.append(pltpu.make_async_copy(
                                src.at[e_i, pl.ds(s0, n)],
                                dst.at[buf, pl.ds(d0, n)],
                                sems.at[buf, i * 3 + j]))
                    return cps

                lin = e * num_bands + b
                par = jax.lax.rem(lin, 2)

                @pl.when(lin == 0)
                def _first():
                    for c in copies_for(e, b, par):
                        c.start()

                nlin = lin + 1

                @pl.when(nlin < (1 if skip_dma else B * num_bands))
                def _prefetch():
                    ne = nlin // num_bands
                    nb2 = jax.lax.rem(nlin, num_bands)
                    for c in copies_for(ne, nb2, 1 - par):
                        c.start()

                if skip_dma:
                    @pl.when(lin == 0)
                    def _wait_first():
                        for c in copies_for(e, b, par):
                            c.wait()
                else:
                    for c in copies_for(e, b, par):
                        c.wait()
                blocks = (s_occ[par], s_dir[par], s_afood[par],
                          s_efood[par], s_chem[par])
            else:
                copies = []
                for i, (src, dst) in enumerate(zip(srcs, dsts)):
                    for j, (s0, d0, n) in enumerate(slices):
                        c = pltpu.make_async_copy(
                            src.at[e, pl.ds(s0, n)], dst.at[pl.ds(d0, n)],
                            sems.at[i * 3 + j])
                        c.start()
                        copies.append(c)
                for c in copies:
                    c.wait()
                blocks = (s_occ[:], s_dir[:], s_afood[:], s_efood[:],
                          s_chem[:])

            shape = (Wp, H)
            row0 = jnp.asarray(top, jnp.uint32)
            from die_tpu.fast.env import fast_step_full, tree_sum_2d

            turn_rule = None
            if tp_ref is not None:
                from die_tpu.fast.learned import make_turn_rule

                turn_rule = make_turn_rule(tp_ref, dyn)

            sl = slice(r, r + Wb)

            def inner(k, carry):
                occ, dirf, afood, efood, chem, flow_step = carry
                flow_field = None
                if has_flow:
                    fcopies = [pltpu.make_async_copy(
                        fstack_h.at[k, pl.ds(s0, n)],
                        s_flow.at[pl.ds(d0, n)], fsems.at[j])
                        for j, (s0, d0, n) in enumerate(slices)]
                    for c in fcopies:
                        c.start()
                    for c in fcopies:
                        c.wait()
                    flow_field = s_flow[:]
                k0, k1 = keys_ref[e, k, 0], keys_ref[e, k, 1]
                bits = FastStepBits(
                    rand=_kernel_bits_banded(dyn, k0, k1, shape, row0, W),
                    prio_rot=None if dyn.per_cell_priority
                    else _kernel_prio_rot(k0, k1))
                state = FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                                     env_food=efood, chem=chem,
                                     flow_step=flow_step)
                ns, _, _, gained = fast_step_full(dyn, state, bits,
                                                  turn_rule=turn_rule,
                                                  flow_field=flow_field)
                reward_o[0, b, k] = tree_sum_2d(jnp, gained[sl])
                num_o[0, b, k] = jnp.sum(
                    (ns.occ[sl] > np.float32(0.0)).astype(jnp.int32))
                return (ns.occ, ns.dir, ns.agent_food, ns.env_food, ns.chem,
                        ns.flow_step)

            carry = blocks + (flow_in[0, 0],)
            if skip_compute:
                for k in range(K):
                    reward_o[0, b, k] = np.float32(0.0)
                    num_o[0, b, k] = np.int32(0)
                occ, dirf, afood, efood, chem = blocks
                flow_step = flow_in[0, 0]
            else:
                occ, dirf, afood, efood, chem, flow_step = jax.lax.fori_loop(
                    0, K, inner, carry)
            occ_o[0] = occ[sl]
            dir_o[0] = dirf[sl]
            afood_o[0] = afood[sl]
            efood_o[0] = efood[sl]
            chem_o[0] = chem[sl]
            flow_o[0, 0] = flow_step
        finally:
            set_pallas_trace(prev)

    field_b = jax.ShapeDtypeStruct((B, W, H), jnp.float32)
    band_spec = pl.BlockSpec((1, Wb, H), lambda e, b, *_: (e, b, 0),
                             memory_space=pltpu.VMEM)
    per_env_spec = pl.BlockSpec((1, num_bands, K),
                                lambda e, b, *_: (e, 0, 0),
                                memory_space=pltpu.SMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [scalar_spec]
    if has_flow:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 5
    buf_shape = (2, Wp, H) if double_buffer else (Wp, H)
    sem_shape = (2, 15) if double_buffer else (15,)
    scratch = [pltpu.VMEM(buf_shape, jnp.float32)] * 5
    if has_flow:
        scratch += [pltpu.VMEM((Wp, H), jnp.float32),
                    pltpu.SemaphoreType.DMA(sem_shape),
                    pltpu.SemaphoreType.DMA((3,))]
    else:
        scratch += [pltpu.SemaphoreType.DMA(sem_shape)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if learned else 1,
        grid=(B, num_bands),
        in_specs=in_specs,
        out_specs=(band_spec,) * 5 + (per_env_spec, per_env_spec,
                                      scalar_spec),
        scratch_shapes=scratch,
    )

    def step(state: FastEnvState, site_keys, flow_stack=None,
             turn_params=None):
        if has_flow and flow_stack is None:
            raise ValueError("flow dynamics need the precomputed "
                             "[num_inner, W, H] flow_stack (see "
                             "pallas_banded_rollout_batch)")
        if learned == (turn_params is None):
            raise ValueError("turn_params required iff learned=True")
        args = [site_keys]
        if learned:
            args += [turn_params]
        args += [state.flow_step.reshape(1, 1)]
        if has_flow:
            args += [flow_stack]
        args += [state.occ, state.dir, state.agent_food, state.env_food,
                 state.chem]
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(field_b,) * 5 + (
                jax.ShapeDtypeStruct((B, num_bands, K), jnp.float32),
                jax.ShapeDtypeStruct((B, num_bands, K), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            interpret=interpret,
        )(*args)
        occ, dirf, afood, efood, chem, rewards, nums, flow = outs
        new_state = FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                                 env_food=efood, chem=chem,
                                 flow_step=flow[0, 0])
        # band-order reward fold (documented fp32 order divergence vs the
        # whole-field pinned tree; exact for the int32 agent count)
        return new_state, jnp.sum(rewards, axis=1), jnp.sum(nums, axis=1)

    return step


def pallas_banded_rollout(dyn: FastDynamics, state: FastEnvState,
                          rollout_key, num_steps: int, num_bands: int,
                          num_inner: int = 1, t0: int = 0,
                          interpret: bool = False,
                          double_buffer: bool = True, turn_params=None):
    """Scan over the banded large-field step, single env (jit this).
    For lockstep batches use :func:`pallas_banded_rollout_batch`."""
    batched = FastEnvState(occ=state.occ[None], dir=state.dir[None],
                           agent_food=state.agent_food[None],
                           env_food=state.env_food[None],
                           chem=state.chem[None],
                           flow_step=state.flow_step)
    out, rewards, nums = pallas_banded_rollout_batch(
        dyn, batched, rollout_key[None], num_steps, num_bands,
        num_inner=num_inner, t0=t0, interpret=interpret,
        double_buffer=double_buffer, turn_params=turn_params)
    return FastEnvState(occ=out.occ[0], dir=out.dir[0],
                        agent_food=out.agent_food[0],
                        env_food=out.env_food[0], chem=out.chem[0],
                        flow_step=out.flow_step), rewards[:, 0], nums[:, 0]


def pallas_banded_rollout_batch(dyn: FastDynamics, states: FastEnvState,
                                rollout_keys, num_steps: int,
                                num_bands: int, num_inner: int = 1,
                                t0: int = 0, interpret: bool = False,
                                double_buffer: bool = True,
                                turn_params=None):
    """Scan over the banded step for a lockstep batch: state fields
    ``[B, W, H]``, ``rollout_keys`` ``u32[B, 2]``, ``num_inner`` fused
    steps per kernel launch (num_steps % num_inner == 0).  Returns
    (states, rewards[T, B], nums[T, B]).

    Wave/perlin flow: each chunk's flow fields F(flow_step + k) are
    computed from the scan-carried ``flow_step`` (one shared stack for the
    lockstep batch — no t0-based invariant) and DMA'd into the kernel."""
    assert num_steps % num_inner == 0
    B, W, H = states.occ.shape
    step = make_pallas_banded_step(dyn, (W, H), num_bands, batch=B,
                                   num_inner=num_inner, interpret=interpret,
                                   double_buffer=double_buffer,
                                   learned=turn_params is not None)
    has_flow = dyn.flow.kind != "none"

    def body(carry, ts):
        st = carry
        keys = jax.vmap(lambda k: jax.vmap(
            lambda t: site_keys_for_step(k, t))(ts))(rollout_keys)
        fstack = None
        if has_flow:
            from die_tpu.ops.waves import flow_field_any

            fstack = jax.vmap(lambda k: flow_field_any(
                dyn.flow, (W, H), st.flow_step + k))(jnp.arange(num_inner))
        st, rewards, nums = step(st, keys, fstack,
                                 turn_params=turn_params)  # (B, K)
        return st, (rewards, nums)

    chunks = (jnp.arange(num_steps) + t0).reshape(-1, num_inner)
    states, (rewards, nums) = jax.lax.scan(body, states, chunks)
    rewards = jnp.swapaxes(rewards, 1, 2).reshape(num_steps, B)
    nums = jnp.swapaxes(nums, 1, 2).reshape(num_steps, B)
    return states, rewards, nums
