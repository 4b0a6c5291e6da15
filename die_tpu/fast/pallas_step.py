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

Limitations of the kernel path (guarded): flow.kind == 'none' (wave flow
runs in the XLA path), pow2 field sizes >= (8, 128).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from die_tpu.core.mathx import set_pallas_trace
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
    try:
        _step_kernel_body(dyn, keys_ref, flow_ref, occ_ref, dir_ref,
                          afood_ref, efood_ref, chem_ref, occ_o, dir_o,
                          afood_o, efood_o, chem_o, reward_o, num_o, flow_o)
    finally:
        set_pallas_trace(prev)


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
    try:
        _multi_step_kernel_body(dyn, num_inner, keys_ref, flow_ref, occ_ref,
                                dir_ref, afood_ref, efood_ref, chem_ref,
                                occ_o, dir_o, afood_o, efood_o, chem_o,
                                reward_o, num_o, flow_o)
    finally:
        set_pallas_trace(prev)


def _multi_step_kernel_body(dyn: FastDynamics, num_inner: int, keys_ref,
                            flow_ref, occ_ref, dir_ref, afood_ref, efood_ref,
                            chem_ref, occ_o, dir_o, afood_o, efood_o, chem_o,
                            reward_o, num_o, flow_o):
    shape = occ_ref.shape

    def body(k, carry):
        occ, dirf, afood, efood, chem, flow_step = carry
        bits = FastStepBits(
            rand=_kernel_bits(dyn, keys_ref[k, 0], keys_ref[k, 1], shape),
            prio_rot=None if dyn.per_cell_priority
            else _kernel_prio_rot(keys_ref[k, 0], keys_ref[k, 1]))
        state = FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                             env_food=efood, chem=chem,
                             flow_step=flow_step)
        new_state, reward, num = fast_step(dyn, state, bits)
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
                           interpret: bool = False):
    """Returns jittable ``chunk(state, site_keys[K,2]) -> (state,
    rewards[K], nums[K])`` running K steps per kernel launch."""
    if dyn.flow.kind == "perlin":
        raise NotImplementedError("perlin flow draws jax.random keys and "
                                  "runs on the XLA path, not in the kernel")
    W, H = field_size
    if (W & (W - 1)) or (H & (H - 1)) or W < 8 or H < 128:
        raise ValueError("pallas step needs pow2 field sizes >= (8, 128)")

    field = jax.ShapeDtypeStruct((W, H), jnp.float32)
    kernel = partial(_multi_step_kernel, dyn, num_inner)

    def chunk(state: FastEnvState, site_keys):
        outs = pl.pallas_call(
            kernel,
            out_shape=(field, field, field, field, field,
                       jax.ShapeDtypeStruct((num_inner, 1), jnp.float32),
                       jax.ShapeDtypeStruct((num_inner, 1), jnp.int32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 5
            + (pl.BlockSpec(memory_space=pltpu.SMEM),) * 3,
            interpret=interpret,
        )(site_keys, state.flow_step.reshape(1, 1), state.occ, state.dir,
          state.agent_food, state.env_food, state.chem)
        occ, dirf, afood, efood, chem, rewards, nums, flow = outs
        new_state = FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                                 env_food=efood, chem=chem,
                                 flow_step=flow[0, 0])
        return new_state, rewards[:, 0], nums[:, 0]

    return chunk


def pallas_fast_rollout_multi(dyn: FastDynamics, state: FastEnvState,
                              rollout_key, num_steps: int,
                              num_inner: int = 8, t0: int = 0,
                              interpret: bool = False):
    """Scan over K-step VMEM-resident kernel chunks (num_steps % K == 0)."""
    assert num_steps % num_inner == 0
    chunk = make_pallas_multi_step(dyn, state.occ.shape, num_inner,
                                   interpret=interpret)
    all_keys = jax.vmap(lambda t: site_keys_for_step(rollout_key, t))(
        jnp.arange(num_steps) + t0)
    chunked_keys = all_keys.reshape(num_steps // num_inner, num_inner, 2)

    def body(carry, keys_k):
        st = carry
        st, rewards, nums = chunk(st, keys_k)
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
