"""On-chip numeric divergence vs the NumPy oracle (round-4, VERDICT r3
item 2): turn the "on TPU, parity is ulp-tolerance" claim into data.

For each engine path — exact engine (Physarum policy rollout), fast XLA
scan, Pallas whole-field kernel, Pallas banded kernel — runs T steps on the
current backend with the per-step states stacked ON DEVICE, fetches the
stacked trajectory ONCE (respecting the ~50 MB/s tunnel), and compares
against the seeded NumPy oracle:

  * first divergent step (first t with any differing bit),
  * max ulp distance per field over the whole trajectory,
  * fraction of differing elements at the final step.

ulp distance: |monotonic_int(a) - monotonic_int(b)| where monotonic_int
maps f32 bit patterns to a monotone integer line (sign-magnitude folded),
so 1 ulp = adjacent representable floats.

Small geometries keep the fetches cheap (exact 64x64 ~3.6 MB, fast 64x128
~5 MB per path).  Results are committed to docs/PARITY.md.

Run:  python tools/tpu_parity.py [--steps 32] [--cpu]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def monotonic_int(a: np.ndarray) -> np.ndarray:
    """f32 bits -> monotone int64 line (NaNs map to the top, stable)."""
    bits = np.asarray(a, np.float32).view(np.uint32).astype(np.int64)
    neg = bits >= 0x80000000
    return np.where(neg, 0x80000000 - bits, bits)


def ulp_diff(a, b):
    return np.abs(monotonic_int(a) - monotonic_int(b))


def compare(name, traj_dev, traj_oracle, field_names):
    """traj_*: dict field -> [T, ...] arrays."""
    T = next(iter(traj_dev.values())).shape[0]
    first_div = None
    max_ulp = {f: 0 for f in field_names}
    for t in range(T):
        any_diff = False
        for f in field_names:
            d = ulp_diff(traj_dev[f][t], traj_oracle[f][t])
            m = int(d.max()) if d.size else 0
            max_ulp[f] = max(max_ulp[f], m)
            if m > 0:
                any_diff = True
        if any_diff and first_div is None:
            first_div = t
    final_frac = {}
    for f in field_names:
        d = ulp_diff(traj_dev[f][-1], traj_oracle[f][-1])
        final_frac[f] = round(float((d > 0).mean()), 4) if d.size else 0.0
    rec = {"path": name, "steps": T,
           "first_divergent_step": first_div,
           "max_ulp": max_ulp, "final_step_diff_frac": final_frac,
           "bitwise": first_div is None}
    print(json.dumps(rec), flush=True)
    with open("tools/tpu_parity_log.jsonl", "a") as fh:
        fh.write(json.dumps(dict(rec, ts=time.strftime("%F %T"))) + "\n")
    return rec


# ---------------------------------------------------------------- exact
def run_exact(steps, flow=False):
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.core import channels as ch
    from die_tpu.core.config import Dynamics
    from die_tpu.core.init import init_env_state
    from die_tpu.core.rng import np_key
    from die_tpu.models.gradient import PhysarumPolicy
    from die_tpu.oracle.agents import OraclePhysarumAgent
    from die_tpu.oracle.env import oracle_init_state
    from die_tpu.oracle.rollout import oracle_rollout, oracle_session_keys
    from die_tpu.parallel.rollout import rollout

    size, n = (64, 64), 4096
    if flow:
        from die_tpu.core.config import FlowConfig

        dyn = Dynamics(init_agent_ratio=0.15,
                       flow=FlowConfig(kind="wave", scale=0.5, decay=0.5,
                                       dt=0.01))
    else:
        dyn = Dynamics(init_agent_ratio=0.15)
    policy = PhysarumPolicy(max_agents=n, scale=0.007, turn_angle=30,
                            sense_offset=0.04)
    seed = 0
    master = jr.PRNGKey(seed)
    kje = jr.fold_in(master, ch.TAG_SESSION_ENV_INIT)
    kjp = jr.fold_in(master, ch.TAG_SESSION_POLICY_INIT)
    kjr = jr.fold_in(master, ch.TAG_SESSION_ROLLOUT)
    state = init_env_state(kje, size, dyn, n)
    pstate = policy.init_state(kjp)

    @jax.jit
    def roll(state, pstate):
        # 1-step rollout calls inside a scan: bitwise-equal to the fused
        # multi-step rollout (the sense carry re-gather is exact) while
        # exposing per-step states for the trajectory stack
        def body(carry, t):
            st, ps = carry
            res = rollout(dyn, policy, None, st, ps, kjr, 1, t)
            return ((res.state, res.pstate),
                    (res.state.medium, res.state.agents))
        (_, _), (mediums, agents) = jax.lax.scan(
            body, (state, pstate), jnp.arange(steps))
        return mediums, agents

    t0 = time.perf_counter()
    mediums, agents = roll(state, pstate)
    mediums = np.asarray(mediums)   # ONE bulk fetch each
    agents = np.asarray(agents)
    print(f"exact: device+fetch {time.perf_counter()-t0:.1f}s", flush=True)

    # oracle twin (the np threefry/key-derivation twin of the session)
    kne, knp_, knr = oracle_session_keys(np_key(seed))
    o_state = oracle_init_state(kne, size, dyn, n)
    o_agent = OraclePhysarumAgent(max_agents=n, scale=0.007, turn_angle=30,
                                  sense_offset=0.04)
    o_agent.init_state(knp_)
    o_med = np.zeros_like(mediums)
    o_agt = np.zeros_like(agents)
    for t in range(steps):
        o_state, _, _ = oracle_rollout(dyn, o_agent, o_state, knr, 1, t0=t)
        o_med[t] = o_state.medium
        o_agt[t] = o_state.agents
    return compare("exact_engine_flow" if flow else "exact_engine",
                   {"medium": mediums, "agents": agents},
                   {"medium": o_med, "agents": o_agt},
                   ["medium", "agents"])


# ----------------------------------------------------------------- fast
def _fast_traj(dyn, roll_fn, steps, size):
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from die_tpu.fast.init import fast_init_jax

    state0 = fast_init_jax(jr.PRNGKey(3), size, dyn)

    @jax.jit
    def run(state):
        def body(st, t):
            st, _, _ = roll_fn(st, t)
            return st, (st.occ, st.dir, st.agent_food, st.env_food, st.chem)
        _, traj = jax.lax.scan(body, state, jnp.arange(steps))
        return traj

    t0 = time.perf_counter()
    traj = tuple(np.asarray(x) for x in run(state0))
    print(f"fast path: device+fetch {time.perf_counter()-t0:.1f}s",
          flush=True)
    return traj


def run_fast(steps, which):
    import jax.random as jr

    from die_tpu.core.rng import np_key
    from die_tpu.fast.config import FastDynamics, tuned_dynamics
    from die_tpu.fast.init import fast_init_np
    from die_tpu.fast.rollout import fast_rollout, oracle_fast_rollout

    size = (64, 128)
    if which.endswith("_16dir"):
        dyn = tuned_dynamics(16)
        which_base = which[:-6]
    elif which.endswith("_flow"):
        from die_tpu.fast.config import FlowConfig

        dyn = FastDynamics(flow=FlowConfig(kind="wave", scale=0.05,
                                           decay=0.1))
        which_base = which[:-5]
    elif which.endswith("_perlin"):
        from die_tpu.fast.config import FlowConfig

        dyn = FastDynamics(flow=FlowConfig(kind="perlin", scale=0.05,
                                           decay=0.1, octaves=4))
        which_base = which[:-7]
    else:
        dyn = FastDynamics()
        which_base = which
    names = ("occ", "dir", "agent_food", "env_food", "chem")
    rkey = jr.PRNGKey(4)

    import jax

    interp = jax.default_backend() != "tpu"
    if which_base == "fast_xla":
        roll = lambda st, t: fast_rollout(dyn, st, rkey, 1, t0=t)  # noqa
    elif which_base == "fast_pallas":
        if dyn.flow.kind == "perlin":
            # the 1-step wrapper refuses perlin (in-kernel jax.random);
            # the K-step kernel precomputes the flow stack and DMAs it
            from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

            roll = lambda st, t: pallas_fast_rollout_multi(  # noqa
                dyn, st, rkey, 1, num_inner=1, t0=t, interpret=interp)
        else:
            from die_tpu.fast.pallas_step import pallas_fast_rollout

            roll = lambda st, t: pallas_fast_rollout(  # noqa
                dyn, st, rkey, 1, t0=t, interpret=interp)
    elif which_base == "fast_banded":
        from die_tpu.fast.pallas_step import pallas_banded_rollout

        roll = lambda st, t: pallas_banded_rollout(  # noqa
            dyn, st, rkey, 1, num_bands=2, t0=t, interpret=interp)
    traj = _fast_traj(dyn, roll, steps, size)

    # oracle trajectory (np backend of the shared body — the executable
    # spec; the independent naive oracle is pinned to it in tests/)
    o_state = fast_init_np(np_key(3), size, dyn)
    o_traj = {n: np.zeros((steps,) + size, np.float32) for n in names}
    st = o_state
    for t in range(steps):
        st, _, _ = oracle_fast_rollout(dyn, st, np_key(4), 1, t0=t)
        for n in names:
            o_traj[n][t] = getattr(st, n)
    return compare(which, dict(zip(names, traj)), o_traj, list(names))


def run_fast_learned(steps, family="linear"):
    """Learned turn rule inside the K-step kernel (SMEM params operand —
    linear round 4, per-cell MLP round 5) vs the NumPy oracle running the
    same rule."""
    import jax
    import jax.random as jr

    from die_tpu.core.rng import np_key
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_np
    from die_tpu.fast.learned import (
        init_mlp_params,
        init_mlp_wide_params,
        init_turn_params,
        np_init_mlp_params,
        np_init_mlp_wide_params,
        np_init_turn_params,
        oracle_learned_rollout,
    )
    from die_tpu.fast.pallas_step import pallas_fast_rollout_multi

    size = (64, 128)
    dyn = FastDynamics()
    names = ("occ", "dir", "agent_food", "env_food", "chem")
    rkey = jr.PRNGKey(4)
    if family == "wide":
        params = init_mlp_wide_params(jr.PRNGKey(7))
        np_params = np_init_mlp_wide_params(np_key(7))
    elif family == "mlp":
        params = init_mlp_params(jr.PRNGKey(7))
        np_params = np_init_mlp_params(np_key(7))
    else:
        params = init_turn_params(jr.PRNGKey(7))
        np_params = np_init_turn_params(np_key(7))
    interp = jax.default_backend() != "tpu"

    roll = lambda st, t: pallas_fast_rollout_multi(  # noqa: E731
        dyn, st, rkey, 1, num_inner=1, t0=t, interpret=interp,
        turn_params=params)
    traj = _fast_traj(dyn, roll, steps, size)

    st = fast_init_np(np_key(3), size, dyn)
    o_traj = {n: np.zeros((steps,) + size, np.float32) for n in names}
    for t in range(steps):
        st, _, _ = oracle_learned_rollout(dyn, np_params, st, np_key(4), 1,
                                          t0=t)
        for n in names:
            o_traj[n][t] = getattr(st, n)
    return compare(f"fast_pallas_learned_{family}", dict(zip(names, traj)),
                   o_traj, list(names))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--paths", default="exact,fast_xla,fast_pallas,"
                                       "fast_banded")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from die_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    print(json.dumps({"backend": jax.default_backend(),
                      "steps": args.steps}), flush=True)
    for p in args.paths.split(","):
        try:
            if p == "exact":
                run_exact(args.steps)
            elif p == "exact_flow":
                run_exact(args.steps, flow=True)
            elif p == "fast_pallas_learned":
                run_fast_learned(args.steps)
            elif p == "fast_pallas_mlp":
                run_fast_learned(args.steps, family="mlp")
            elif p == "fast_pallas_mlp_wide":
                run_fast_learned(args.steps, family="wide")
            else:
                run_fast(args.steps, p)
        except Exception as e:
            print(json.dumps({"path": p, "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
