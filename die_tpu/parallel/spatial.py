"""Spatial domain decomposition — the sequence-parallel analog (SURVEY §5.7).

For fields too large for one device, the W axis shards over a ``space`` mesh
axis and each step runs on halo-padded local blocks inside ``shard_map``:
ring ``ppermute`` exchanges R boundary rows with both neighbors (the torus
boundary IS the ring), the full lattice step executes on the padded block,
and the center slice is kept.  R must cover one step's influence radius
(sense_dist + 2 movement hops + diffusion radius — see halo_radius).

State fields after a sharded step are bitwise identical to the unsharded
step (verified in tests on the 8-virtual-device CPU mesh).  The per-step
reward is reduced blockwise + psum, which changes the fp32 summation order
versus the global pinned tree-fold — rewards are therefore reported from the
blockwise order (deterministic for a fixed mesh, documented divergence).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.6 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits, fast_step_full
from die_tpu.ops.gaussian import gaussian_taps


def halo_radius(dyn: FastDynamics) -> int:
    """One step's influence radius: sensing + movement round-trip + diffusion,
    plus two more hops when reproduction is on.

    Movement contributes TWO hops, not one: whether an agent at j moved
    depends on its target's accepted code (acc at j+-1), which depends on
    received at j+-1, i.e. on the turn decisions of all of the target's
    neighbors (j+-2), whose probes reach sense_dist further.  The deposit
    mask then feeds the diffusion stencil.  A radius of sense_dist+1+G
    (the old formula) corrupts moved/dep_mask on the outermost interior
    rows — caught by the banded-kernel bitwise test at step 3.

    agents_born adds TWO further hops on the agent channels (not chem —
    deposit uses the pre-birth move markers): ``born`` at j reads the
    neighbors' post-move fertility codes (radius sense+3), and the parents'
    halved food reads the child cell's acceptance back (radius sense+4).
    The agent-channel radius is therefore sense+4 while chem needs
    sense+2+diffuse_r; the halo covers the max.  With the previous formula,
    agents_born + diffuse_sigma < 0.5 silently diverged bitwise from the
    unsharded step (advisor finding, round 1).

    The 16-direction lattice's knight offsets reach TWO rows per hop
    (sensing probes at sense_dist reach 2*sense_dist rows), so every term
    except the diffusion radius doubles."""
    diffuse_r = (len(gaussian_taps(dyn.diffuse_sigma)) - 1) // 2
    hop = 2 if dyn.num_dirs == 16 else 1
    base = hop * (int(dyn.sense_dist) + 2) + diffuse_r
    if dyn.agents_born:
        base = max(base, hop * (int(dyn.sense_dist) + 4))
    return base


def _exchange_halo(field, r: int, axis_name: str, n: int):
    """Pad a [w_loc, H] block with r rows from each ring neighbor."""
    top = field[:r]
    bottom = field[-r:]
    # my bottom rows become the next device's top halo, and vice versa
    from_prev = jax.lax.ppermute(bottom, axis_name,
                                 perm=[(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(top, axis_name,
                                 perm=[(i, (i - 1) % n) for i in range(n)])
    return jnp.concatenate([from_prev, field, from_next], axis=0)


def make_spatial_fast_step(dyn: FastDynamics, mesh: Mesh,
                           axis: str = "space"):
    """Returns jittable ``step(state, bits) -> (state, reward, num)`` with
    every state field sharded P(axis, None) over rows.

    Wave/perlin flow: the per-step flow field F(flow_step) is computed
    OUTSIDE the shard_map (elementwise in global coordinates — XLA SPMD
    partitions it with the state) and enters the local step as one more
    halo-padded operand, so the halo rows' env_food evolves exactly as in
    the unsharded step."""
    r = halo_radius(dyn)
    n = mesh.shape[axis]
    has_flow = dyn.flow.kind != "none"

    def local_step(occ, dirf, afood, efood, chem, rand, *flow_args):
        pad = partial(_exchange_halo, r=r, axis_name=axis, n=n)
        state = FastEnvState(occ=pad(occ), dir=pad(dirf),
                             agent_food=pad(afood), env_food=pad(efood),
                             chem=pad(chem), flow_step=jnp.int32(0))
        bits = FastStepBits(rand=pad(rand))
        flow_field = pad(flow_args[0]) if has_flow else None
        new_state, _, _, gained = fast_step_full(dyn, state, bits,
                                                 flow_field=flow_field)
        sl = slice(r, -r)
        new_occ = new_state.occ[sl]
        # blockwise reward/num + psum (documented order divergence)
        reward = jax.lax.psum(jnp.sum(gained[sl]), axis)
        num = jax.lax.psum(
            jnp.sum((new_occ > 0).astype(jnp.int32)), axis)
        return (new_occ, new_state.dir[sl], new_state.agent_food[sl],
                new_state.env_food[sl], new_state.chem[sl], reward, num)

    # the flow-field operand (and its sharded spec) exist only when the
    # dynamics have flow — no zeros placeholder rides the shard_map
    n_in = 7 if has_flow else 6
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis, None),) * n_in,
        out_specs=((P(axis, None),) * 5 + (P(), P())),
        check_vma=False,
    )

    def step(state: FastEnvState, bits: FastStepBits):
        flow_step = state.flow_step
        flow_args = ()
        if has_flow:
            from die_tpu.ops.waves import flow_field_any

            W, H = state.occ.shape
            flow_args = (flow_field_any(dyn.flow, (W, H), flow_step),)
            flow_step = flow_step + 1
        occ, dirf, afood, efood, chem, reward, num = sharded(
            state.occ, state.dir, state.agent_food, state.env_food,
            state.chem, bits.rand, *flow_args)
        return FastEnvState(occ=occ, dir=dirf, agent_food=afood,
                            env_food=efood, chem=chem,
                            flow_step=flow_step), reward, num

    return step


def shard_field_state(mesh: Mesh, state: FastEnvState, axis: str = "space"):
    sharding = NamedSharding(mesh, P(axis, None))
    scalar = NamedSharding(mesh, P())
    return FastEnvState(
        occ=jax.device_put(state.occ, sharding),
        dir=jax.device_put(state.dir, sharding),
        agent_food=jax.device_put(state.agent_food, sharding),
        env_food=jax.device_put(state.env_food, sharding),
        chem=jax.device_put(state.chem, sharding),
        flow_step=jax.device_put(state.flow_step, scalar),
    )


def spatial_fast_rollout(dyn: FastDynamics, mesh: Mesh, state: FastEnvState,
                         rollout_key, num_steps: int, t0: int = 0,
                         axis: str = "space"):
    """Scan the halo-exchange sharded step over ``num_steps`` (jit this).

    Per-step bits are generated from the global counter grid; XLA shards the
    generation to match the field layout, so trajectories are bitwise
    identical to the unsharded rollout."""
    from die_tpu.fast.rollout import jax_step_bits

    step = make_spatial_fast_step(dyn, mesh, axis=axis)
    shape = state.occ.shape

    def body(carry, t):
        st = carry
        bits = jax_step_bits(dyn, rollout_key, t, shape)
        st, reward, num = step(st, bits)
        return st, (reward, num)

    state, (rewards, nums) = jax.lax.scan(body, state,
                                          jnp.arange(num_steps) + t0)
    return state, rewards, nums
