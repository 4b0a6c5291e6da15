"""Cumulative decomposition of the exact-engine Physarum policy on TPU.

The round-2b profile left the policy (~41 of 77.9 ms/batch-step) as the
dominant exact-engine cost, attributed loosely to "three byte-plane field
gathers + gradient stencil + polar math".  This tool splits it: each
variant scans T iterations of a PREFIX of the policy pipeline inside one
jit (pstate carried, obs fixed), so marginal differences cancel the fixed
tunnel cost (docs/PERF.md round-2 correction)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from die_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.env import agent_cells, coords_to_cells, gather_field
from die_tpu.core.init import init_env_state
from die_tpu.core.mathx import atan2, polar2xy
from die_tpu.models.gradient import GradientState, PhysarumPolicy, _noise_2n


def timed(f, *a, reps=3):
    r = f(*a)
    float(np.asarray(r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        float(np.asarray(r))
        best = min(best, time.perf_counter() - t0)
    return best


B, F, N, T = 64, 256, 65536, 32
dyn = Dynamics(init_agent_ratio=0.15)
policy = PhysarumPolicy(max_agents=N, scale=0.007, turn_angle=30,
                        sense_offset=0.04)
ek = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
states = jax.jit(jax.vmap(lambda k: init_env_state(k, (F, F), dyn, N)))(ek)
pk = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(1), i))(jnp.arange(B))
pstates = jax.jit(jax.vmap(policy.init_state))(pk)

x = jnp.ones((8, 128), jnp.float32)
off = timed(jax.jit(lambda x: jnp.sum(x + 1.0)), x, reps=5)
print(json.dumps({"item": "off_ms", "v": round(off * 1e3, 1)}), flush=True)


def variant(tag, piece):
    """piece(state, pstate, key, t) -> (pstate, scalar)."""

    def one(state, pstate, key):
        def body(carry, t):
            ps = carry
            ps, out = piece(state, ps, jr.fold_in(key, t), t)
            return ps, out

        ps, outs = jax.lax.scan(body, pstate, jnp.arange(T))
        return jnp.sum(outs)

    run = jax.jit(lambda ss, pp, kk: jnp.sum(
        jax.vmap(one)(ss, pp, kk)))
    b = timed(run, states, pstates, pk)
    print(json.dumps({"item": tag,
                      "ms_per_batch_step": round((b - off) / T * 1e3, 2)}),
          flush=True)


def grad_field_only(state, ps, key, t):
    chem = state.medium[ch.CH_MED_CHEM]
    gx, gy = policy._gradient_field(chem)
    # consume ps so the scan carries it (keeps variants comparable)
    return ps, jnp.sum(gx) + jnp.sum(gy) + ps.direction_rads[0]


def upto_pair_gather(state, ps, key, t):
    from die_tpu.ops.mxu_gather import onehot_gather_multi

    agents, medium = state.agents, state.medium
    W, H = medium.shape[-2], medium.shape[-1]
    gx, gy = policy._gradient_field(medium[ch.CH_MED_CHEM])
    off_x, off_y = polar2xy(np.float32(policy._sense_offset),
                            ps.direction_rads)
    cx = coords_to_cells(agents[ch.CH_AGT_X] + off_x, W)
    cy = coords_to_cells(agents[ch.CH_AGT_Y] + off_y, H)
    gpx, gpy = onehot_gather_multi((gx.reshape(-1), gy.reshape(-1)),
                                   cx * H + cy)
    ps2 = GradientState(prev_grad=ps.prev_grad,
                        direction_rads=atan2(gpy, gpx))
    return ps2, jnp.sum(gpx) + jnp.sum(gpy)


def upto_turn_math(state, ps, key, t):
    from die_tpu.ops.mxu_gather import onehot_gather_multi

    agents, medium = state.agents, state.medium
    W, H = medium.shape[-2], medium.shape[-1]
    gx, gy = policy._gradient_field(medium[ch.CH_MED_CHEM])
    off_x, off_y = polar2xy(np.float32(policy._sense_offset),
                            ps.direction_rads)
    cx = coords_to_cells(agents[ch.CH_AGT_X] + off_x, W)
    cy = coords_to_cells(agents[ch.CH_AGT_Y] + off_y, H)
    gpx, gpy = onehot_gather_multi((gx.reshape(-1), gy.reshape(-1)),
                                   cx * H + cy)
    (gpx, gpy), _dir, dmask = policy._process_gradient(
        (gpx, gpy), ps.direction_rads, key)
    inertia = np.float32(policy._inertia)
    one = np.float32(1.0)
    gpx = (one - inertia) * gpx + inertia * ps.prev_grad[0]
    gpy = (one - inertia) * gpy + inertia * ps.prev_grad[1]
    noise = _noise_2n(jr.fold_in(key, ch.TAG_DRAW_1), agents.shape[-1])
    gpx = gpx + np.float32(policy._noise_scale) * noise[0]
    gpy = gpy + np.float32(policy._noise_scale) * noise[1]
    ps2 = GradientState(prev_grad=jnp.stack([gpx, gpy]),
                        direction_rads=atan2(gpy, gpx))
    return ps2, jnp.sum(gpx) + jnp.sum(dmask)


def full_policy(state, ps, key, t):
    action, ps2 = policy.forward(None, ps, (state.agents, state.medium), key)
    return ps2, jnp.sum(action)


def food_gather_only(state, ps, key, t):
    agents, medium = state.agents, state.medium
    W, H = medium.shape[-2], medium.shape[-1]
    ix, iy = agent_cells(agents, (W, H))
    sensed = gather_field(medium[ch.CH_MED_FOOD], ix, iy)
    return ps, jnp.sum(sensed) + ps.direction_rads[0]


variant("grad_field", grad_field_only)
variant("grad+pair_gather", upto_pair_gather)
variant("grad+gather+turnmath", upto_turn_math)
variant("full_policy", full_policy)
variant("food_gather_alone", food_gather_only)
