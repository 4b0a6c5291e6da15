"""Worst-case influence-radius regression (advisor finding, round 1).

With agents_born, one step's influence radius on the agent channels is
sense_dist + 4, NOT sense_dist + 2 + diffuse_r: ``born`` reads the
neighbors' post-move fertility (two extra hops beyond 'moved').  The old
halo formula under-covered whenever diffuse_r < 2 (e.g. diffuse_sigma=0.25)
and the sharded paths silently diverged bitwise.

The chain is too rare to fuzz (it needs diagonal probe geometry), so this
test constructs it deterministically, fabricating the per-cell random bits:

  chem(1,22) --S=3 probe--> turn of R(4,19) --> whether R (post-heading SE)
  competes for T=(5,20) --priority--> whether Q(6,20, heading N) moves or
  stays --> post-move fertility of (6,20) --post_empty of C=(7,20)--> whether
  P (moved (7,20)->(8,20), birth_dir N) spawns --> agent_food(8,20) halves.

Row distance: 8 - 1 = 7 = sense_dist + 4.
"""
import numpy as np
import jax
import jax.numpy as jnp

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits, fast_step
from die_tpu.parallel.mesh import env_mesh
from die_tpu.parallel.spatial import (
    halo_radius,
    make_spatial_fast_step,
    shard_field_state,
)

SIZE = (64, 64)

DYN = FastDynamics(agents_born=True, birth_threshold=0.5,
                   diffuse_sigma=0.25, init_agent_ratio=0.0)


def chain_state(xp, input_chem: float):
    """The constructed S+4 chain (see module docstring)."""
    W, H = SIZE
    occ = np.zeros(SIZE, np.float32)
    dirf = np.zeros(SIZE, np.float32)
    afood = np.zeros(SIZE, np.float32)
    chem = np.zeros(SIZE, np.float32)
    rand = np.zeros(SIZE, np.uint32)

    # P: parent-to-be, moves S into (8,20); fertile
    occ[7, 20] = 1.0
    dirf[7, 20] = 6.0  # S
    afood[7, 20] = 0.8
    # Q: heading N toward T=(5,20); fertile if it stays
    occ[6, 20] = 1.0
    dirf[6, 20] = 2.0  # N
    afood[6, 20] = 0.8
    # R: pre-heading E at (4,19); its turn decides whether it contests T
    occ[4, 19] = 1.0
    dirf[4, 19] = 0.0  # E
    afood[4, 19] = 0.8

    # R's probes (sense_dist=3 from (4,19)): left NE->(1,22) [the input],
    # fwd E->(4,22), right SE->(7,22)
    chem[1, 22] = np.float32(input_chem)
    chem[7, 22] = 0.5

    # fabricated decision bits (bit 0 turn tiebreak, bits 1-3 priority,
    # bits 4-6 blocked re-heading, bits 7-9 birth direction)
    rand[5, 20] = np.uint32(7) << 1          # T priority: SE arrival (R) wins
    rand[6, 20] = (np.uint32(2) << 4) | (np.uint32(6) << 7)  # Q: re-head N,
    #                                          propose child S (blocked case)
    rand[7, 20] = np.uint32(6) << 1          # C priority: S proposal (Q) wins
    rand[8, 20] = np.uint32(2) << 7          # P post-move: child N -> (7,20)

    return FastEnvState(
        occ=xp.asarray(occ), dir=xp.asarray(dirf),
        agent_food=xp.asarray(afood),
        env_food=xp.zeros(SIZE, np.float32),
        chem=xp.asarray(chem),
        flow_step=xp.zeros((), np.int32),
    ), FastStepBits(rand=xp.asarray(rand))


def test_chain_reaches_sense_plus_4():
    """The constructed chain fires: input at row 1 changes agent_food at
    row 8 (distance sense_dist + 4) — so halo_radius must cover it."""
    out = {}
    for v in (0.0, 5.0):
        state, bits = chain_state(np, v)
        new, _, _ = fast_step(DYN, state, bits)
        out[v] = np.asarray(new.agent_food)[8, 20]
    # input=0: R wins T, Q blocked, (7,20) occupied, P cannot spawn
    # input=5: R turns away, Q vacates, P spawns and its food halves
    assert out[0.0] != out[5.0], out
    assert halo_radius(DYN) >= DYN.sense_dist + 4


def test_spatial_covers_constructed_chain():
    """The chain placed across the shard boundary at row 8: the sharded step
    must stay bitwise identical.  Fails with the old halo formula
    (sense+2+diffuse_r = 6 < 7)."""
    mesh = env_mesh(axis="space")
    assert SIZE[0] % mesh.shape["space"] == 0
    sp_step = jax.jit(make_spatial_fast_step(DYN, mesh))
    for v in (0.0, 5.0):
        state, bits = chain_state(jnp, v)
        ref, _, ref_num = jax.jit(lambda s, b: fast_step(DYN, s, b))(
            state, bits)
        out, _, num = sp_step(shard_field_state(mesh, state), bits)
        assert int(num) == int(ref_num), v
        for name, a, b in zip(ref._fields, ref, out):
            if name == "flow_step":
                continue
            assert np.array_equal(np.asarray(a), np.asarray(b)), \
                f"{name} input={v}"
