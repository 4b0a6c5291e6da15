"""Substep-cumulative decomposition of the exact engine on TPU.

Each variant scans T steps of a PREFIX of the env_step pipeline inside one
jit, so the fixed per-call tunnel cost cancels in marginal differences
(docs/PERF.md round-2 correction).  Produced the corrected exact-engine
profile table in docs/PERF.md."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from die_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, jax.random as jr
from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core import env as E
from die_tpu.core.init import init_env_state

def timed(f, *a, reps=3):
    r = f(*a); float(np.asarray(r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); r = f(*a); float(np.asarray(r))
        best = min(best, time.perf_counter() - t0)
    return best

B, F, N, T = 64, 256, 65536, 32
dyn = Dynamics(init_agent_ratio=0.15)
ek = jax.vmap(lambda i: jr.fold_in(jr.PRNGKey(0), i))(jnp.arange(B))
states = jax.jit(jax.vmap(lambda k: init_env_state(k, (F, F), dyn, N)))(ek)
action = jnp.zeros((3, N), jnp.float32)

x = jnp.ones((8, 128), jnp.float32)
off = timed(jax.jit(lambda x: jnp.sum(x + 1.0)), x, reps=5)
print(json.dumps({"item": "off_ms", "v": round(off*1e3, 1)}), flush=True)

def variant(tag, step_fn):
    def one(state):
        def body(carry, t):
            s = carry
            s, out = step_fn(s)
            return s, out
        s, outs = jax.lax.scan(body, state, jnp.arange(T))
        return jnp.sum(outs)
    run = jax.jit(lambda ss: jnp.sum(jax.vmap(one)(ss)))
    b = timed(run, states)
    print(json.dumps({"item": tag, "ms_per_batch_step": round((b-off)/T*1e3, 2)}), flush=True)

from die_tpu.core.state import EnvState

def upto_move(s):
    a = E._move(dyn, s.agents, action)
    return EnvState(medium=s.medium, agents=a, flow_step=s.flow_step), jnp.sum(a[0])
variant("move", upto_move)

def upto_deposit(s):
    a = E._move(dyn, s.agents, action)
    m = E._deposit_and_layout(dyn, s.medium, a, action)
    return EnvState(medium=m, agents=a, flow_step=s.flow_step), jnp.sum(m[2])
variant("move_deposit", upto_deposit)

def upto_feed(s):
    a = E._move(dyn, s.agents, action)
    m = E._deposit_and_layout(dyn, s.medium, a, action)
    m, a, g = E._feed(dyn, m, a, action)
    return EnvState(medium=m, agents=a, flow_step=s.flow_step), jnp.sum(g)
variant("move_deposit_feed", upto_feed)

def upto_diffuse(s):
    a = E._move(dyn, s.agents, action)
    m = E._deposit_and_layout(dyn, s.medium, a, action)
    m, a, g = E._feed(dyn, m, a, action)
    a = E._lifecycle(dyn, a)
    m, fs = E._resource_dynamics(dyn, m, s.flow_step)
    m = E._diffuse_decay(dyn, m)
    return EnvState(medium=m, agents=a, flow_step=fs), jnp.sum(g)
variant("all_but_info", upto_diffuse)

def fullstep(s):
    s2, info = E.env_step(dyn, s, action)
    return s2, info.reward
variant("full_step", fullstep)
