"""Deposit packed-key formulation: the contested-last-cell side path.

At hw == 2^16 (the headline 256x256 field) the packed u32 key's dead-slot
pseudo-cell run collides with the REAL last cell (255,255), which
_deposit_and_layout resolves with a side max-reduction (core/env.py).
These tests pin that path with constructed collisions — alive agents
racing dead slots at the last cell — against the reference winner-take-
last semantics (numpy "last write wins": highest slot among ALIVE agents,
reference core/env.py:211-215), on both the native and the MXU-scatter
routes.
"""
import numpy as np
import jax
import jax.numpy as jnp

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.env import _deposit_and_layout
from die_tpu.ops.mxu_gather import use_mxu_gather

F = 256
N = 64
LAST = np.float32(1.0)   # coord 1.0 -> cell 255 on the linspace grid
FIRST = np.float32(0.0)


def _build(last_cell_alive=True):
    """Agents: slots 3,9,17 alive at the last cell (255,255) (dead when
    ``last_cell_alive`` is False); slots 20,40 DEAD but with coords also
    mapping to the last cell; slot 5 alive at (0,0); the rest dead at
    (0,0)."""
    agents = np.zeros((4, N), np.float32)
    action = np.zeros((3, N), np.float32)
    a = 1.0 if last_cell_alive else 0.0
    for slot, (x, y, alive, dep) in {
        3: (LAST, LAST, a, 0.25),
        9: (LAST, LAST, a, 0.5),
        17: (LAST, LAST, a, 0.125),     # winner: highest alive slot
        20: (LAST, LAST, 0.0, 9.0),     # dead: higher slot, must NOT win
        40: (LAST, LAST, 0.0, 9.0),
        5: (FIRST, FIRST, 1.0, 0.75),
    }.items():
        agents[ch.CH_AGT_X, slot] = x
        agents[ch.CH_AGT_Y, slot] = y
        agents[ch.CH_AGT_ALIVE, slot] = alive
        action[ch.CH_ACT_DEPOSIT, slot] = dep
    medium = np.zeros((3, F, F), np.float32)
    medium[ch.CH_MED_CHEM] = 0.5
    return jnp.asarray(medium), jnp.asarray(agents), jnp.asarray(action)


def _expected(medium):
    exp_chem = np.asarray(medium[ch.CH_MED_CHEM]).copy()
    exp_occ = np.zeros((F, F), np.float32)
    # winner at (255,255): alive slot 17, deposit 0.125 (dead 20/40 excluded)
    exp_chem[255, 255] += np.float32(0.125)
    exp_occ[255, 255] = 1.0
    # cell (0,0): alive slot 5 wins over the dead zero-coord slots
    exp_chem[0, 0] += np.float32(0.75)
    exp_occ[0, 0] = 1.0
    return exp_chem, exp_occ


def _run_and_check(mxu):
    medium, agents, action = _build()
    dyn = Dynamics()
    use_mxu_gather(mxu)
    try:
        out = jax.jit(lambda m, a, act: _deposit_and_layout(dyn, m, a, act)
                      )(medium, agents, action)
    finally:
        use_mxu_gather(None)
        jax.clear_caches()
    exp_chem, exp_occ = _expected(medium)
    assert np.array_equal(np.asarray(out[ch.CH_MED_CHEM]), exp_chem)
    assert np.array_equal(np.asarray(out[ch.CH_MED_AGENTS]), exp_occ)


def test_last_cell_winner_native_scatter():
    _run_and_check(mxu=False)


def test_last_cell_winner_mxu_scatter():
    _run_and_check(mxu=True)


def test_negative_zero_deposit_at_last_cell():
    """Constructed -0.0 case (round-2 advisor): when both the chem cell and
    the winning deposit are -0.0, the reference's single buffered addition
    yields (-0.0) + (-0.0) = -0.0.  The side path must preserve that bit
    (it adds the bit-extracted winning deposit to the ORIGINAL chem value,
    not to the +0.0-rescattered intermediate)."""
    agents = np.zeros((4, N), np.float32)
    action = np.zeros((3, N), np.float32)
    agents[ch.CH_AGT_X, 17] = LAST
    agents[ch.CH_AGT_Y, 17] = LAST
    agents[ch.CH_AGT_ALIVE, 17] = 1.0
    action[ch.CH_ACT_DEPOSIT, 17] = np.float32(-0.0)
    medium = np.zeros((3, F, F), np.float32)
    medium[ch.CH_MED_CHEM, 255, 255] = np.float32(-0.0)
    dyn = Dynamics()
    for mxu in (False, True):
        use_mxu_gather(mxu)
        try:
            out = jax.jit(lambda m, a, act: _deposit_and_layout(dyn, m, a,
                                                                act))(
                jnp.asarray(medium), jnp.asarray(agents), jnp.asarray(action))
        finally:
            use_mxu_gather(None)
            jax.clear_caches()
        v = np.asarray(out[ch.CH_MED_CHEM])[255, 255]
        assert v == 0.0 and np.signbit(v), (mxu, v)
        assert np.asarray(out[ch.CH_MED_AGENTS])[255, 255] == 1.0, mxu


def test_no_alive_agent_at_last_cell():
    """Only dead slots map to the last cell: nothing may be deposited
    there and occupancy must stay 0 (the side reduction's has=False arm)."""
    medium, agents, action = _build(last_cell_alive=False)
    dyn = Dynamics()
    use_mxu_gather(False)
    try:
        out = jax.jit(lambda m, a, act: _deposit_and_layout(dyn, m, a, act)
                      )(medium, agents, action)
    finally:
        use_mxu_gather(None)
        jax.clear_caches()
    chem = np.asarray(out[ch.CH_MED_CHEM])
    occ = np.asarray(out[ch.CH_MED_AGENTS])
    assert chem[255, 255] == np.float32(0.5)
    assert occ[255, 255] == 0.0
    assert chem[0, 0] == np.float32(0.5) + np.float32(0.75)
    assert occ[0, 0] == 1.0
