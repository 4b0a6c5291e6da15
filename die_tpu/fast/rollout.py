"""Fast-engine rollouts: per-backend RNG wrappers + fused scan / eager oracle.

RNG contract: step t draws bits from k_t = fold_in(rollout_key, t) with site
tags TURN=0, PRIO=1, BLOCK=2 — identical streams on both backends.
"""
from __future__ import annotations

import numpy as np

from die_tpu.core.rng import np_fold_in, np_murmur_bits, np_random_bits
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits, fast_step


_PRIO_SALT = np.uint32(0x9E3779B9)


def _np_prio_rot(k_t: np.ndarray) -> np.uint32:
    from die_tpu.core.rng import murmur_finalize

    with np.errstate(over="ignore"):
        return murmur_finalize(np.uint32(k_t[0]) ^ np.uint32(k_t[1])
                               ^ _PRIO_SALT)


def np_step_bits(dyn: FastDynamics, rollout_key: np.ndarray, t: int,
                 shape) -> FastStepBits:
    k_t = np_fold_in(rollout_key, t)
    rot = None if dyn.per_cell_priority else _np_prio_rot(k_t)
    if dyn.rng_kind == "murmur":
        return FastStepBits(rand=np_murmur_bits(k_t, shape), prio_rot=rot)
    return FastStepBits(rand=np_random_bits(k_t, shape), prio_rot=rot)


def oracle_fast_rollout(dyn: FastDynamics, state: FastEnvState,
                        rollout_key: np.ndarray, num_steps: int, t0: int = 0):
    """Eager NumPy rollout — the fast engine's executable spec."""
    shape = state.occ.shape
    rewards = np.zeros(num_steps, np.float32)
    nums = np.zeros(num_steps, np.int32)
    for i in range(num_steps):
        bits = np_step_bits(dyn, rollout_key, t0 + i, shape)
        state, reward, num = fast_step(dyn, state, bits)
        rewards[i] = reward
        nums[i] = num
    return state, rewards, nums


def jax_murmur_bits(key, shape):
    import jax
    import jax.numpy as jnp

    from die_tpu.core.rng import murmur_finalize

    H = shape[1]
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    counts = row * np.uint32(H) + col
    h = murmur_finalize(counts ^ key[0])
    return murmur_finalize(h ^ key[1])


def jax_step_bits(dyn: FastDynamics, rollout_key, t, shape) -> FastStepBits:
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core.rng import murmur_finalize

    k_t = jr.fold_in(rollout_key, t)
    rot = None
    if not dyn.per_cell_priority:
        kw = jnp.asarray(k_t, jnp.uint32)
        rot = murmur_finalize(kw[0] ^ kw[1] ^ _PRIO_SALT)
    if dyn.rng_kind == "murmur":
        return FastStepBits(rand=jax_murmur_bits(k_t, shape), prio_rot=rot)
    return FastStepBits(rand=jr.bits(k_t, shape, jnp.uint32), prio_rot=rot)


def fast_rollout(dyn: FastDynamics, state: FastEnvState, rollout_key,
                 num_steps: int, t0: int = 0):
    """Fused scan rollout (jit this; vmap over envs for lockstep batches)."""
    import jax
    import jax.numpy as jnp

    shape = state.occ.shape

    def body(carry, t):
        st = carry
        bits = jax_step_bits(dyn, rollout_key, t, shape)
        st, reward, num = fast_step(dyn, st, bits)
        return st, (reward, num)

    state, (rewards, nums) = jax.lax.scan(
        body, state, jnp.arange(num_steps) + t0)
    return state, rewards, nums


def choose_bands(dyn: FastDynamics, W: int, H: int,
                 vmem_budget_cells: int = 256 * 256) -> int:
    """Band count for the banded kernel, or 1 when the geometry cannot run
    it (then callers use the whole-field kernel or the XLA scan).

    Picks the largest band count whose band height stays >= the (8-aligned)
    halo and keeps the padded block near the VMEM-proven working size, then
    validates the exact kernel constraints — the padded block (band + torus
    halo on both sides) must fit the field and bands must stay 8-row
    aligned.  Extreme aspect ratios (e.g. 16 x 8192) otherwise land on
    bands=2 with W - Wb < 2r and the kernel constructor raises (advisor
    finding, round 1)."""
    from die_tpu.parallel.spatial import halo_radius

    r = -(-halo_radius(dyn) // 8) * 8
    bands = 1
    while (W // (bands * 2)) >= max(r, 8) and \
            (W // (bands * 2)) * H > vmem_budget_cells // 2:
        bands *= 2
    Wb = W // bands
    if bands > 1 and W - Wb >= 2 * r and Wb % 8 == 0:
        return bands
    return 1


def banded_budget(dyn: FastDynamics,
                  vmem_budget_cells: int = 256 * 256) -> int:
    """The VMEM cell budget the BANDED kernel route plans with.  The
    16-direction lattice gets a quarter of the whole-field budget: banded
    blocks keep the unrolled roll form (blocks are narrow), so they carry
    ~2x the rolled intermediates of the Moore lattice per band — the
    conservative count avoids Mosaic VMEM overflow at 512^2+.  Shared by
    fast_rollout_auto and learned_fast_rollout_auto (advisor round 4: the
    learned path previously skipped the reduction)."""
    if dyn.num_dirs == 16:
        return vmem_budget_cells // 4
    return vmem_budget_cells


def fast_rollout_auto(dyn: FastDynamics, state: FastEnvState, rollout_key,
                      num_steps: int, t0: int = 0, num_inner: int = 32,
                      vmem_budget_cells: int = 256 * 256):
    """Geometry-aware rollout: picks the fastest available path.

    - whole-field K-step Pallas kernel when the field fits the VMEM budget
      (pow2 sizes >= (8, 128), num_steps % num_inner == 0; all flow kinds
      — perlin fields are precomputed and DMA'd);
    - banded Pallas kernel for larger pow2 fields (4-5x the XLA path;
      all flow kinds);
    - the XLA scan otherwise (any geometry).

    Invariant for perlin flow: the kernel path precomputes flow fields from
    t0-based global step indices, so resumed states must be passed with
    ``t0 == state.flow_step`` (checked when flow_step is concrete — see
    pallas_fast_rollout_multi).
    """
    import jax

    W, H = state.occ.shape
    pow2_ok = (W & (W - 1)) == 0 and (H & (H - 1)) == 0 and W >= 8 and H >= 128
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and pow2_ok:
        # whole-field kernel: all flow kinds (perlin fields are
        # precomputed and DMA'd).  The 16-direction lattice shares the
        # 8-dir budget since round 4: the on-demand roll restructure in
        # fast_step_full (lowmem + birth-phase fori_loop) bounds its live
        # set, and 256^2 whole-field compiles and runs for none/wave/
        # perlin flow at 84,380 / 77,048 / 80,416 env-steps/s vs the old
        # banded route's 46,862 (docs/PERF.md round 4)
        if W * H <= vmem_budget_cells and num_steps % num_inner == 0:
            from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

            return pallas_fast_rollout_multi(dyn, state, rollout_key,
                                             num_steps, num_inner=num_inner,
                                             t0=t0)
    vmem_budget_cells = banded_budget(dyn, vmem_budget_cells)
    if on_tpu and pow2_ok:
        # banded kernel: all flow kinds (wave/perlin stacks are computed
        # from the carried flow_step and DMA'd per inner step)
        bands = choose_bands(dyn, W, H, vmem_budget_cells)
        if bands > 1:
            from die_tpu.fast.pallas_step import pallas_banded_rollout

            return pallas_banded_rollout(dyn, state, rollout_key, num_steps,
                                         num_bands=bands, t0=t0)
    return fast_rollout(dyn, state, rollout_key, num_steps, t0=t0)
