"""Plugging custom cost and food-flow rules into the environment — the open
operator extension point (reference: arbitrary ``op_action_cost`` /
``op_food_flow`` callables, core/env.py:44-46, core/data_init.py:29-38).

Operators are backend-generic functions registered BY NAME (configs stay
frozen/hashable, so jit-static); the same function runs in the jitted engine
(xp = jax.numpy) and the NumPy oracle (xp = numpy), which is what keeps
bit-exact parity testing available for user rules — see
die_tpu/core/operators.py for the full contract and tests/test_operators.py
for the two-implementation parity pattern.

Run:  python examples/custom_operators.py [--size 48] [--iters 40]
"""
import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu import (Dynamics, FlowConfig, register_cost_operator,
                     register_flow_operator)


# A quadratic movement cost: cheap small adjustments, expensive sprints.
#   burned = 0.2 * (dx^2 + dy^2) + 0.01 * |deposit|
@register_cost_operator("quadratic")
def quadratic_cost(xp, dynamics, action):
    dx, dy, dep = action[0], action[1], action[2]
    return (np.float32(0.2) * (dx * dx + dy * dy)
            + np.float32(0.01) * xp.abs(dep))


# A seasonal food pulse: the whole field decays, and every `period` steps a
# fresh uniform ration drops in (a rule the built-in wave/perlin family
# cannot express).  flow_step arrives as an i32 scalar; under jit this is a
# traced value, so the periodicity is computed with array ops, not Python if.
@register_flow_operator("seasonal")
def seasonal_flow(xp, flow, food, flow_step):
    period = xp.int32(max(1, int(1.0 / max(flow.dt, 1e-9)) // 10))
    pulse = (xp.int32(flow_step) % period == 0).astype(xp.float32)
    return (np.float32(1.0) - np.float32(flow.decay)) * food \
        + np.float32(flow.scale) * pulse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "alone is captured too early)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from die_tpu.core import channels as ch
    from die_tpu.core.init import init_env_state
    from die_tpu.models.static import BrownianPolicy
    from die_tpu.parallel.rollout import rollout

    dyn = Dynamics(
        cost_op="quadratic",
        flow=FlowConfig(kind="seasonal", scale=0.2, decay=0.02, dt=0.01),
    )
    # config round-trips through JSON (operators referenced by name; the
    # registering module just has to be imported on load)
    dyn = Dynamics.from_json(dyn.to_json())

    size = (args.size, args.size)
    master = jr.PRNGKey(args.seed)
    state = init_env_state(jr.fold_in(master, ch.TAG_SESSION_ENV_INIT),
                           size, dyn)
    policy = BrownianPolicy(move_scale=0.01)
    pstate = policy.init_state(jr.fold_in(master, ch.TAG_SESSION_POLICY_INIT))
    roll_key = jr.fold_in(master, ch.TAG_SESSION_ROLLOUT)

    run = jax.jit(lambda s, p: rollout(dyn, policy, None, s, p, roll_key,
                                       args.iters, jnp.int32(0)))
    res = run(state, pstate)
    total = float(np.asarray(res.total_reward))
    print(f"custom-operator rollout: {args.iters} steps, "
          f"total reward {total:.4f}, "
          f"food mass {float(jnp.sum(res.state.medium[1])):.2f}")


if __name__ == "__main__":
    main()
