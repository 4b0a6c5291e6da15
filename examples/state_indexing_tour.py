"""State-indexing crib sheet — twin of the reference's xarray receipt
collection (examples/notebook_session_init.py): the same handful of recipes
(build test fields, alive-mask filtering, coord-based gather, pointwise
selection) expressed in the jnp/channel-constant data model.

Run it (CPU is fine: DIE_TPU_CPU=1 python examples/state_indexing_tour.py)
or paste blocks into a notebook / REPL session.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax

if _os.environ.get("DIE_TPU_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.builder import StateBuilder
from die_tpu.core.env import coords_to_cells, gather_field


def get_test_fields(field_size=(8, 6), agents_ratio=0.2, max_agents=16):
    """Reference `get_test_fields` (notebook_session_init.py): medium built
    from per-channel recipes, agents extracted from occupancy."""
    state = (StateBuilder(field_size, jr.PRNGKey(0))
             .with_agents(ratio=agents_ratio)
             .with_food_perlin(threshold=0.5)
             .with_chem(threshold=0.25)
             .build_env_state(max_agents=max_agents))
    return state


def main():
    state = get_test_fields()
    medium, agents = state.medium, state.agents
    print("medium:", medium.shape, "(channels: agents, env_food, chem1)")
    print("agents:", agents.shape, "(channels: x, y, alive, agent_food)")

    # --- alive-mask indexing -------------------------------------------------
    # reference: action.where(alive > 0).dropna(dim='index')
    # here: boolean mask over the slot axis (static shapes -> keep the mask;
    # use jnp.where(mask, ...) instead of dropping rows)
    alive = agents[ch.CH_AGT_ALIVE] > 0.0
    print("alive slots:", int(alive.sum()), "/", alive.shape[0])
    xy_alive = jnp.where(alive[None, :],
                         agents[ch.CH_AGT_X:ch.CH_AGT_Y + 1], 0.0)
    print("alive coords (masked):", np.asarray(xy_alive).round(3))

    # --- coords -> cell indices (the nearest-neighbor receipt) ---------------
    # reference: medium.sel(x=..., y=..., method='nearest')
    # here: ix = round(x * (W-1)) on the linspace(0,1,W) grid
    W, H = medium.shape[1:]
    xs = jnp.asarray([0.13, 0.4], jnp.float32)
    ys = jnp.asarray([0.15, 0.6], jnp.float32)
    ix, iy = coords_to_cells(xs, W), coords_to_cells(ys, H)
    print("nearest cells for x=[0.13,0.4]:", np.asarray(ix),
          "y=[0.15,0.6]:", np.asarray(iy))

    # --- pointwise gather (the vectorized-indexing receipt) ------------------
    # reference: medium.sel(x=DataArray(...), y=DataArray(...)) pointwise
    food_at = gather_field(medium[ch.CH_MED_FOOD], ix, iy)
    print("env_food at those points:", np.asarray(food_at).round(4))

    # --- per-agent gather (what AgentIndexer.field_by_agents does) -----------
    ax = coords_to_cells(agents[ch.CH_AGT_X], W)
    ay = coords_to_cells(agents[ch.CH_AGT_Y], H)
    chem_per_agent = gather_field(medium[ch.CH_MED_CHEM], ax, ay)
    print("chem sensed per agent slot:", np.asarray(chem_per_agent).round(4))



if __name__ == "__main__":
    main()
