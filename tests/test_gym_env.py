"""Gym-compatible stateful wrapper: the reference's public loop
(examples/minimal_run.py:14-29) runs verbatim against GymEnv, matches the
functional core bitwise, and reset(seed) actually threads the seed."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.env import env_step, observe
from die_tpu.core.gym_env import GymEnv
from die_tpu.core.init import init_env_state
from die_tpu.models.static import BrownianPolicy

SIZE = (16, 16)


def test_gym_loop_matches_functional_core():
    """The reference minimal loop — obs = reset(); loop: action =
    agent.forward(obs); obs, reward, ... = env.step(action) — produces the
    exact trajectory of the functional core."""
    dyn = Dynamics(init_agent_ratio=0.1)
    env = GymEnv(SIZE, dyn, seed=42)
    policy = BrownianPolicy(move_scale=0.01)
    pkey = jr.PRNGKey(7)

    # functional twin (episode 0 of seed 42's stream)
    state = init_env_state(jr.fold_in(jr.PRNGKey(42), 0), SIZE, dyn)
    step = jax.jit(lambda s, a: env_step(dyn, s, a))

    obs, info0 = env.reset(seed=42)
    assert np.array_equal(np.asarray(obs[0]), np.asarray(state.agents))
    for t in range(5):
        k = jr.fold_in(pkey, t)
        action, _ = policy.forward(None, None, obs, k)
        obs, reward, term, trunc, info = env.step(action)

        ref_obs = observe(dyn, state)
        ref_action, _ = policy.forward(None, None, ref_obs, k)
        state, ref_info = step(state, ref_action)

        assert np.array_equal(np.asarray(obs[0]), np.asarray(state.agents)), t
        assert np.array_equal(np.asarray(obs[1]), np.asarray(state.medium)), t
        assert reward == float(ref_info.reward), t
        assert info["num_agents"] == int(ref_info.num_agents), t
        assert not trunc
        assert set(info) == {"num_agents", "reward", "mean_reward"}


def test_gym_reset_threads_seed():
    """reset(seed) re-initializes deterministically (fixing the reference's
    ignored seed, /root/reference/core/env.py:94-99); different seeds give
    different worlds; reset() with no seed CONTINUES the episode stream
    (Gymnasium contract: fresh but seed-reproducible worlds)."""
    env = GymEnv(SIZE, Dynamics(init_agent_ratio=0.1), seed=1)
    obs1, _ = env.reset(seed=5)
    m1 = np.asarray(env.medium)
    obs2, _ = env.reset(seed=6)
    m2 = np.asarray(env.medium)
    assert not np.array_equal(m1, m2)
    env.reset()  # episode 1 of seed 6's stream: a NEW world...
    m3 = np.asarray(env.medium)
    assert not np.array_equal(m3, m2)
    env.reset(seed=6)  # ...reproducible by restarting the stream
    assert np.array_equal(np.asarray(env.medium), m2)
    env.reset()
    assert np.array_equal(np.asarray(env.medium), m3)
    env.reset(seed=5)
    assert np.array_equal(np.asarray(env.medium), m1)


def test_gym_env_is_gymnasium_env():
    import gymnasium

    env = GymEnv(SIZE)
    assert isinstance(env, gymnasium.Env)
    imgs = env.render()
    assert len(imgs) == 3 and imgs[0].shape[:2] == SIZE
