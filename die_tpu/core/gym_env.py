"""Stateful Gymnasium-compatible wrapper around the functional core.

The reference's public contract is a ``gym.Env`` subclass
(/root/reference/core/env.py:64-133): ``reset(seed) -> (obs, {})``,
``step(action) -> (obs, reward, terminated, truncated, info)`` with
``info = {num_agents, reward(3dp), mean_reward(5dp)}``, and ``render()``
returning the renderer's image list.  The functional redesign
(die_tpu/core/env.py) is the core; this ~80-line wrapper holds the
``EnvState`` and exposes the same external loop for gym-style tooling.

One deliberate improvement over the reference: ``reset(seed=N)`` actually
threads the seed (the reference ignores it and re-inits from the global
NumPy RNG, /root/reference/core/env.py:94-99 — SURVEY §3-B ledger item 5).
Per the Gymnasium contract, ``reset()`` with no seed CONTINUES the episode
RNG stream — episode e draws from ``fold_in(PRNGKey(seed), e)``, so
repeated resets give fresh (but reproducible-from-seed) initial worlds;
``reset(seed=N)`` restarts the stream at episode 0.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.random as jr

from die_tpu.core.config import Dynamics
from die_tpu.core.env import env_step, observe
from die_tpu.core.init import init_env_state

try:  # pragma: no cover - import guard
    import gymnasium as _gym

    _ENV_BASE = _gym.Env
except Exception:  # pragma: no cover
    _gym = None
    _ENV_BASE = object


class GymEnv(_ENV_BASE):
    """gym.Env twin of the reference ``Env`` (core/env.py:64-133).

    ``obs`` is the reference's tuple ``(agents f32[4,N],
    sensed_medium f32[3,W,H])`` as device arrays; actions are f32[3, N]
    ``(dx, dy, deposit1)`` arrays (numpy or jax).
    """

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, field_size: Tuple[int, int],
                 dynamics: Optional[Dynamics] = None,
                 max_agents: Optional[int] = None, seed: int = 0):
        self._field_size = tuple(field_size)
        self.dynamics = dynamics or Dynamics()
        self._max_agents = max_agents
        self._seed = int(seed)
        self._step = jax.jit(lambda s, a: env_step(self.dynamics, s, a))
        self._observe = jax.jit(lambda s: observe(self.dynamics, s))
        self._init = jax.jit(
            lambda k: init_env_state(k, self._field_size, self.dynamics,
                                     self._max_agents))
        self._renderer = None
        self.state = None
        self.reset(seed=seed)

    # ------------------------------------------------------------------ gym
    def reset(self, *, seed: Optional[int] = None,
              options: Optional[dict] = None):
        if seed is not None:
            self._seed = int(seed)
            self._episode = 0
        elif getattr(self, "_episode", None) is None:
            self._episode = 0
        self.state = self._init(
            jr.fold_in(jr.PRNGKey(self._seed), self._episode))
        self._episode += 1
        return self._obs(), {}

    def step(self, action):
        import jax.numpy as jnp

        self.state, info = self._step(self.state, jnp.asarray(action,
                                                              jnp.float32))
        reward = float(info.reward)
        num_agents = int(info.num_agents)
        # the reference rounds the reported stats (core/env.py:122-126)
        info_dict = {
            "num_agents": num_agents,
            "reward": float(np.round(reward, 3)),
            "mean_reward": float(np.round(float(info.mean_reward), 5)),
        }
        return self._obs(), reward, bool(info.terminated), False, info_dict

    def render(self):
        from die_tpu.render.renderer import EnvRenderer

        if self._renderer is None:
            self._renderer = EnvRenderer(self._field_size)
        return self._renderer.render(np.asarray(self.state.medium),
                                     np.asarray(self.state.agents))

    # -------------------------------------------------------------- helpers
    def _obs(self):
        return self._observe(self.state)

    @property
    def medium(self):
        return self.state.medium

    @property
    def agents(self):
        return self.state.agents
