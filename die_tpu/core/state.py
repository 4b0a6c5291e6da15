"""Environment state pytree.

The reference keeps mutable xarray state on an ``Env`` object
(core/env.py:74-86).  TPU-native state is an immutable pytree threaded through
pure step functions — jittable, vmappable, shardable, checkpointable.
"""
from __future__ import annotations

from typing import NamedTuple


class EnvState(NamedTuple):
    """Complete simulation state for one environment.

    medium:    f32[3, W, H] — (agents occupancy, env_food, chem1)
    agents:    f32[4, N]    — (x, y, alive, agent_food); dead slots zero-filled
                              (reference semantics, core/data_init.py:146-147)
    flow_step: i32[]        — index into the cycled food-flow time grid
    """

    medium: object
    agents: object
    flow_step: object

    @property
    def field_size(self):
        return self.medium.shape[-2], self.medium.shape[-1]

    @property
    def num_slots(self):
        return self.agents.shape[-1]


class StepInfo(NamedTuple):
    """Per-step statistics — twin of the reference ``info`` dict
    (core/env.py:122-126) plus the termination flag."""

    reward: object      # f32[] — total energy gain over all slots
    num_agents: object  # i32[] — alive count (post-lifecycle)
    mean_reward: object # f32[] — reward / num_agents (0 if extinct)
    terminated: object  # bool[]
