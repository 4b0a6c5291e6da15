"""Frozen, hashable simulation configs (jit-static), JSON round-trippable.

Twin of the reference's ``Dynamics`` dataclass (core/env.py:42-61) plus the
food-flow operator configuration that the reference passes as a stateful
closure (``FieldSequence.get_flow_operator``, core/data_init.py:29-38).
Because configs are frozen and hashable they can be passed as static args to
``jax.jit`` so every flag resolves at trace time (no runtime branching).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from enum import Enum
from typing import Optional


class Boundary(str, Enum):
    """Agent-coordinate boundary condition — core/env.py:24-26."""

    WRAP = "wrap"
    LIMIT = "limit"


class DiffuseMode(str, Enum):
    """Stencil padding for the Gaussian diffusion — skimage ``mode`` names."""

    WRAP = "wrap"
    NEAREST = "nearest"


@dataclass(frozen=True)
class FlowConfig:
    """Agent-independent resource inflow (``op_food_flow``).

    ``kind='none'`` is identity (reference default, core/env.py:45).
    ``kind='wave'`` replicates ``WaveSequence.get_flow_operator(scale, decay)``
    (core/data_init.py:71-89): ``food' = scale * F(t) + (1 - decay) * food``
    with ``t`` advancing by ``dt`` per step, cycling over ``[t0, t1)``.
    ``kind='perlin'`` is the ``PerlinNoiseSequence`` twin
    (core/data_init.py:55-68): smooth time-varying Perlin noise, realized as
    quintic interpolation between keyed 2D lattice fields.
    """

    # 'none' | 'wave' | 'perlin' | any registered custom kind
    # (die_tpu.core.operators.register_flow_operator) — the reference's
    # arbitrary ``op_food_flow`` callable, by registry name.
    kind: str = "none"
    scale: float = 0.5
    decay: float = 0.5
    dt: float = 0.01
    t0: float = 0.0
    t1: float = 10.0
    octaves: int = 8   # perlin flow: lattice frequency (space and time)
    seed: int = 0      # perlin flow: gradient-lattice seed

    @property
    def num_steps(self) -> int:
        """Length of the cycled time grid (``np.arange(t0, t1, dt)``)."""
        import math

        return max(1, math.ceil((self.t1 - self.t0) / self.dt - 1e-12))


@dataclass(frozen=True)
class Dynamics:
    """Environment physics knobs — twin of core/env.py:42-61.

    The reference's ``op_action_cost`` callable becomes the two weights of
    ``linear_action_cost`` (core/env.py:29-35) plus a ``zero_cost`` switch
    (core/env.py:38).
    """

    rate_feed: float = 0.1
    rate_decay_chem: float = 0.1
    boundary: Boundary = Boundary.WRAP
    diffuse_mode: DiffuseMode = DiffuseMode.WRAP
    diffuse_sigma: float = 0.5
    cost_weight_deposit: float = 0.02
    cost_weight_dist: float = 0.01
    zero_cost: bool = False
    # Name of a registered custom cost operator (die_tpu.core.operators).
    # None = the built-in linear/zero cost above.  The reference's arbitrary
    # ``op_action_cost`` callable (core/env.py:44), by registry name so the
    # config stays hashable/jit-static.
    cost_op: Optional[str] = None
    apply_sense_mask: bool = False
    sense_mask_sigma: float = 2.0
    food_infinite: bool = False
    agents_die: bool = False
    agents_born: bool = False
    init_agent_ratio: float = 0.1
    init_food_threshold: float = 1.0
    init_food_octaves: int = 8
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)
    # Testing knob: force the deposit scatter's stable-sort fallback (the
    # path taken automatically when W*H or the slot count exceeds 2^16) so
    # small-size tests/fuzzing exercise both formulations.  Bitwise-identical
    # results by contract (tests/test_deposit_fallback.py).
    force_stable_scatter: bool = False

    # ------------------------------------------------------------------ JSON
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["boundary"] = self.boundary.value
        d["diffuse_mode"] = self.diffuse_mode.value
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Dynamics":
        d = json.loads(text)
        flow = FlowConfig(**d.pop("flow", {}))
        d["boundary"] = Boundary(d["boundary"])
        d["diffuse_mode"] = DiffuseMode(d["diffuse_mode"])
        return cls(flow=flow, **d)


# Named presets mirroring examples/learning_agents.py:124-129.
def preset(name: str, agent_ratio: float = 0.15) -> Dynamics:
    if name == "st-perlin":
        return Dynamics(init_agent_ratio=agent_ratio, food_infinite=True)
    if name == "st-perlin-wide":
        return Dynamics(
            init_agent_ratio=agent_ratio,
            food_infinite=True,
            rate_decay_chem=0.025,
            diffuse_sigma=0.8,
        )
    if name == "dyn-pred":
        return Dynamics(
            init_agent_ratio=agent_ratio,
            food_infinite=False,
            flow=FlowConfig(kind="wave", scale=0.5, decay=0.5, dt=0.01),
        )
    raise KeyError(f"unknown dynamics preset: {name!r}")
