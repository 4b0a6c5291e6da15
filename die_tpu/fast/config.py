"""Configuration for the field-centric (lattice) engine.

Why this engine exists: the reference-semantics engine keeps a flat agent
array with continuous coordinates, which forces per-agent random gather /
scatter every step.  On TPU, XLA lowers those to serialized loops
(~15-25 ns/element measured on v5e regardless of formulation — scatter-max,
sorted scatter, one-hot MXU, take_along_axis), capping the exact engine at
a few hundred lockstep steps/s.  The TPU-first redesign moves agent state
onto the grid: headings discretized to 8 lattice directions, sensing via
rolled-field selection, movement via pull-based neighbor stencils with
deterministic conflict resolution.  Every operation is a roll / elementwise
op — the shapes XLA and the VPU are built for.

This is the production engine for the BASELINE throughput target; it is a
*lattice variant* of the reference's Physarum dynamics (same capabilities:
offset sensing, discrete turns, deposit trails, feeding, lifecycle, food
flow, diffusion) with its own seeded oracle and bit-exact lockstep contract.
The exact reference-semantics engine (die_tpu/core) remains the parity
reference.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass

from die_tpu.core.config import FlowConfig


@dataclass(frozen=True)
class FastDynamics:
    # lattice resolution: 8 (Moore, 45-degree turns — the faithful Physarum
    # lattice), 4 (von Neumann, 90-degree turns — ~1.7x faster), or 16
    # (Moore + knight offsets, ~22.5-degree turns — closest to the
    # reference's default 30-degree turn_angle, ~2x slower than 8)
    num_dirs: int = 8
    # sensing: probe chem at sense_dist cells along heading and heading +-1
    sense_dist: int = 3
    # movement
    randomize_on_block: bool = True
    # conflict resolution: per-cell random priority rotation (default) or a
    # cheaper per-step scalar rotation (saves ~10%% of kernel passes; ties
    # are then broken identically across the field within one step)
    per_cell_priority: bool = True
    # deposit: chem += deposit_coef * env_food * (1 if moved else idle_deposit)
    deposit_coef: float = 4.0
    idle_deposit: float = 0.1
    # feeding — same meaning as the exact engine (core/env.py:220-243)
    rate_feed: float = 0.1
    cost_move: float = 0.01
    cost_deposit: float = 0.02
    food_infinite: bool = False
    # lifecycle
    agents_die: bool = False
    death_threshold: float = 1e-4
    # reproduction — the reference leaves agents_born as a TODO
    # (core/env.py:256-261); the lattice engine implements it: an agent with
    # agent_food > birth_threshold spawns a child into one empty neighbor
    # (same pull-based conflict resolution as movement), splitting its food
    agents_born: bool = False
    birth_threshold: float = 1.0
    # chem field
    rate_decay_chem: float = 0.1
    diffuse_sigma: float = 0.5
    # RNG: 'murmur' (murmur3-finalizer counter hash, ~10 vector ops) or
    # 'threefry' (the jax.random cipher, ~100 ops); both are part of the
    # bit-contract with the oracle
    rng_kind: str = "murmur"
    # init
    init_agent_ratio: float = 0.15
    init_food_octaves: int = 8
    init_food_threshold: float = 1.0
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "FastDynamics":
        d = json.loads(text)
        flow = FlowConfig(**d.pop("flow", {}))
        return cls(flow=flow, **d)


def tuned_dynamics(num_dirs: int = 8, **overrides) -> FastDynamics:
    """Per-lattice tuned operating points (held-out foraging, the
    eval_lattice protocol: 64x64, 50 steps, 32 seeds).

    The class defaults are the 8-direction (Moore) operating point.  The
    16-direction lattice's knight offsets traverse 2 cells per hop, so the
    8-dir defaults overshoot trails (held-out 33 vs 283); the round-3
    sweeps (tools/sweep_dirs16.py, selection seeds disjoint from the
    held-out block) found its own point: probe at sense_dist 2 (4 rows),
    light deposit on a wider-diffusing chem field, and KEEP the heading
    when blocked — on a 16-way lattice the Jones re-randomization rerolls
    over too many directions and destroys persistence.  Held-out foraging
    653.6 vs the 8-dir default's 283.1 (2.3x) — the finest-turning lattice
    (the closest analog of the reference Physarum's 30-degree turns) is
    now also the best forager, matching the reference's qualitative
    ordering (/root/reference/README.md:17).
    """
    if num_dirs == 16:
        base = dict(num_dirs=16, sense_dist=2, deposit_coef=0.5,
                    rate_decay_chem=0.05, diffuse_sigma=1.25,
                    idle_deposit=0.025, randomize_on_block=False)
    else:
        base = dict(num_dirs=num_dirs)
    base.update(overrides)
    return FastDynamics(**base)


# The lattice-learning evaluation protocol (BASELINE.md "learning-eval
# protocol"): every committed learned-rule number (Jones baselines, the
# held-out artifact scores 692.9 / 662.3 / 574.6 / ...) is measured under
# THIS config — 64x64 fields, 50-step episodes, fresh seeds from the
# 10_000 block (selection sweeps use disjoint blocks), mean total episode
# reward.  init_agent_ratio/food_infinite matter: the bare tuned config
# scores 16-dir Jones at 151.6, not 653.6 (docs/ROADMAP.md round 4).
# tests/test_tuned_dirs16.py pins these values so config drift breaks a
# test instead of silently moving the baseline under the artifacts.
EVAL_PROTOCOL = dict(size=64, steps=50, seed0=10_000, full_seeds=32,
                     init_agent_ratio=0.15, food_infinite=True)


def eval_protocol_dynamics(num_dirs: int = 8) -> FastDynamics:
    """The exact FastDynamics the learning-eval protocol runs under: the
    lattice's tuned operating point with the protocol's population/food
    settings.  Use this (not a hand-built tuned_dynamics call) anywhere a
    number is compared against the committed artifact scores."""
    return tuned_dynamics(
        num_dirs, init_agent_ratio=EVAL_PROTOCOL["init_agent_ratio"],
        food_infinite=EVAL_PROTOCOL["food_infinite"])


# 8 lattice directions, counter-clockwise starting East, as (dx, dy) in
# (row, col) = (x, y) array axes.  d+1 is a 45-degree left turn.
DIR_OFFSETS = (
    (0, 1),    # 0: E
    (-1, 1),   # 1: NE
    (-1, 0),   # 2: N
    (-1, -1),  # 3: NW
    (0, -1),   # 4: W
    (1, -1),   # 5: SW
    (1, 0),    # 6: S
    (1, 1),    # 7: SE
)
NUM_DIRS = 8

# 16 lattice directions (~22.5-degree turns): the Moore neighborhood
# interleaved with the eight distance-sqrt(5) knight offsets, CCW from East;
# offsets[(d + 8) % 16] == -offsets[d].
DIR_OFFSETS_16 = (
    (0, 1),    # 0: E
    (-1, 2),   # 1: ENE
    (-1, 1),   # 2: NE
    (-2, 1),   # 3: NNE
    (-1, 0),   # 4: N
    (-2, -1),  # 5: NNW
    (-1, -1),  # 6: NW
    (-1, -2),  # 7: WNW
    (0, -1),   # 8: W
    (1, -2),   # 9: WSW
    (1, -1),   # 10: SW
    (2, -1),   # 11: SSW
    (1, 0),    # 12: S
    (2, 1),    # 13: SSE
    (1, 1),    # 14: SE
    (1, 2),    # 15: ESE
)
