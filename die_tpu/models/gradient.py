"""Gradient-following policies — twins of core/agent/gradient.py.

GradientPolicy — chemoattractant gradient ascent with per-agent persistent
state (heading + previous gradient), momentum/inertia + Gaussian noise, and
the polar "sense offset" mechanic (gather at coords + offset along heading).
PhysarumPolicy — slime-mold discrete-turn specialization: polar-decompose the
sensed gradient, turn +-turn_angle toward it (random turn when undetermined),
deposit only on successful turns.

RNG contract (draw sites fold from the step's policy key):
  TAG_DRAW_0 — Physarum's random turn signs (reference np.random.randint,
               core/agent/gradient.py:181)
  TAG_DRAW_1 — momentum noise normal(0, 0.4, (2, N)) — ALWAYS drawn, even for
               Physarum where noise_scale=0 (reference draws it too,
               core/agent/gradient.py:87; keeping the draw preserves stream
               alignment with the oracle)
State-init uses TAG_DRAW_0 for the initial ``prev_grad`` noise
(core/agent/gradient.py:42).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.env import agent_cells, coords_to_cells, gather_field
from die_tpu.core.mathx import (
    atan2,
    discretize,
    hypot2,
    polar2xy,
    recip,
    renormalize_radians,
)
from die_tpu.core.rng import sign_from_bits, uniform01_from_bits
from die_tpu.core.mathx import normal_from_uniform
from die_tpu.models.base import Policy, register
from die_tpu.ops.gaussian import central_gradient

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)


class GradientState(NamedTuple):
    prev_grad: object       # f32[2, N]
    direction_rads: object  # f32[N]


def _noise_2n(key, n):
    """0.4-scaled Gaussian (2, N) — ``_get_some_noise``
    (core/agent/gradient.py:50-53) via the contract's normal transform."""
    u = uniform01_from_bits(jr.bits(key, (2, n), jnp.uint32))
    return np.float32(0.4) * normal_from_uniform(u)


@register
class GradientPolicy(Policy):
    def __init__(self,
                 max_agents: int = 10**6,
                 scale: float = 0.01,
                 deposit: float = 4.0,
                 inertia: float = 0.9,
                 sense_offset: float = 0.0,
                 noise_scale: float = 0.025,
                 normalized_grad: bool = True,
                 grad_clip: Optional[float] = 1e-5):
        self.n = int(max_agents)
        self._scale = float(scale)
        self._deposit = float(deposit)
        self._inertia = float(inertia)
        self._sense_offset = float(sense_offset)
        self._noise_scale = float(noise_scale)
        self._normalized = bool(normalized_grad)
        self._grad_clip = grad_clip

    def init_params(self):
        return {
            "max_agents": self.n, "scale": self._scale,
            "deposit": self._deposit, "inertia": self._inertia,
            "sense_offset": self._sense_offset,
            "noise_scale": self._noise_scale,
            "normalized_grad": self._normalized, "grad_clip": self._grad_clip,
        }

    def init_state(self, key):
        noise = _noise_2n(jr.fold_in(key, ch.TAG_DRAW_0), self.n)
        direction = atan2(noise[1], noise[0])
        return GradientState(prev_grad=noise,
                             direction_rads=self._init_direction(direction))

    def _init_direction(self, direction):
        return direction

    # ---- gradient field (core/agent/gradient.py:55-71) ----------------------
    def _gradient_field(self, chem):
        gx, gy = central_gradient(chem)
        norm = hypot2(gx, gy)
        if self._normalized:
            # reference: nan_to_num(grad / norm) — 0/0 -> 0
            # (core/agent/gradient.py:60-62); contract-safe reciprocal here
            pos = norm > _F0
            invn = recip(jnp.where(pos, norm, _F1))
            gx = jnp.where(pos, gx * invn, _F0)
            gy = jnp.where(pos, gy * invn, _F0)
        if self._grad_clip is not None:
            keep = (norm >= np.float32(self._grad_clip)).astype(jnp.float32)
            gx = gx * keep
            gy = gy * keep
        return gx, gy

    # ---- hooks specialized by Physarum --------------------------------------
    def _process_gradient(self, grad_xy, direction, key):
        """Identity for the base policy (core/agent/gradient.py:78-80).
        Returns (grad_xy, direction, deposit_mask)."""
        return grad_xy, direction, None

    def _uses_direction_only(self) -> bool:
        """True when the turn logic consumes ONLY atan2(gy, gx) of the
        gathered gradient pair (Physarum with normalized gradients): the
        direction can then be computed FIELD-side and gathered as one
        field — 4 byte-plane dots instead of 8, bitwise-identical
        (the gather moves exact bits, and atan2 per cell equals atan2 per
        agent on the same bits).  Measured: policy 40.6 -> ~27 ms/batch-
        step at B=64 (docs/PERF.md round 3)."""
        return False

    def _process_deposit(self, sensed_food, deposit_mask):
        """deposit * sensed_food (core/agent/gradient.py:93-94)."""
        return np.float32(self._deposit) * sensed_food

    def render(self, obs):
        """Gradient-field RGB debug view — twin of GradientAgent.render
        (core/agent/gradient.py:126-135).  Stateless: recomputed from obs."""
        import numpy as np_

        from die_tpu.render.renderer import GradientFieldRenderer

        _agents, medium = obs
        gx, gy = self._gradient_field(medium[ch.CH_MED_CHEM])
        return [GradientFieldRenderer.render(np_.asarray(gx),
                                             np_.asarray(gy))]

    # the fused-sense rollout may pass the food value this policy would
    # gather (feed(t)'s gather shares indices with sense(t+1) — see
    # core/env.py::env_step_carry)
    consumes_sensed_food = True

    def forward(self, params, pstate: GradientState, obs, key,
                sensed_food=None):
        agents, medium = obs
        W, H = medium.shape[-2], medium.shape[-1]
        chem = medium[ch.CH_MED_CHEM]

        gx, gy = self._gradient_field(chem)

        # per-agent gather at coords + polar sense offset
        # (core/agent/gradient.py:73-76,104-105)
        off_x, off_y = polar2xy(np.float32(self._sense_offset),
                                pstate.direction_rads)
        cx = coords_to_cells(agents[ch.CH_AGT_X] + off_x, W)
        cy = coords_to_cells(agents[ch.CH_AGT_Y] + off_y, H)
        from die_tpu.ops.mxu_gather import (
            mxu_gather_enabled,
            onehot_gather_multi,
        )

        if self._uses_direction_only():
            # field-side direction: atan2 over the (clipped) gradient
            # FIELD, then ONE gathered field instead of the (gx, gy) pair
            # — halves the dominant policy gather; bitwise-identical
            # because the gather moves exact bits and atan2(cell bits) ==
            # atan2(agent bits)
            drads_field = atan2(gy, gx)
            if mxu_gather_enabled() and (W * H) % 128 == 0:
                (drads,) = onehot_gather_multi(
                    (drads_field.reshape(-1),), cx * H + cy)
            else:
                drads = jnp.take(drads_field.reshape(-1), cx * H + cy)
            (gpx, gpy), direction, deposit_mask = \
                self._process_gradient_rads(drads, pstate.direction_rads,
                                            key)
        else:
            if mxu_gather_enabled() and (W * H) % 128 == 0:
                # MXU route for the hot sense gather (bit-identical to
                # jnp.take INCLUDING the sign of dead +-0 gradients, which
                # atan2 observes; avoids XLA:TPU's serialized-loop lowering)
                gpx, gpy = onehot_gather_multi(
                    (gx.reshape(-1), gy.reshape(-1)), cx * H + cy)
            else:
                # one 2-wide row gather instead of two scalar gathers (same
                # values; halves the serialized-gather cost)
                g_rows = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
                per = jnp.take(g_rows, cx * H + cy, axis=0)
                gpx, gpy = per[:, 0], per[:, 1]

            (gpx, gpy), direction, deposit_mask = self._process_gradient(
                (gpx, gpy), pstate.direction_rads, key)

        # momentum + noise (core/agent/gradient.py:82-91)
        inertia = np.float32(self._inertia)
        gpx = (_F1 - inertia) * gpx + inertia * pstate.prev_grad[0]
        gpy = (_F1 - inertia) * gpy + inertia * pstate.prev_grad[1]
        noise = _noise_2n(jr.fold_in(key, ch.TAG_DRAW_1), agents.shape[-1])
        gpx = gpx + np.float32(self._noise_scale) * noise[0]
        gpy = gpy + np.float32(self._noise_scale) * noise[1]
        prev_grad = jnp.stack([gpx, gpy])

        # heading update after all transforms (core/agent/gradient.py:110)
        new_direction = atan2(gpy, gpx)

        # deposit relative to sensed food at unoffset coords
        # (core/agent/gradient.py:115-117); a fused-sense rollout passes
        # the bit-identical carried value instead (one fewer gather)
        if sensed_food is None:
            ix, iy = agent_cells(agents, (W, H))
            sensed_food = gather_field(medium[ch.CH_MED_FOOD], ix, iy)
        deposit = self._process_deposit(sensed_food, deposit_mask)

        action = jnp.stack([gpx * np.float32(self._scale),
                            gpy * np.float32(self._scale),
                            deposit])
        return action, GradientState(prev_grad=prev_grad,
                                     direction_rads=new_direction)


@register
class PhysarumPolicy(GradientPolicy):
    def __init__(self,
                 max_agents: int = 10**6,
                 scale: float = 0.005,
                 deposit: float = 4.0,
                 inertia: float = 0.0,
                 sense_offset: float = 0.03,
                 noise_scale: float = 0.0,
                 normalized_grad: bool = True,
                 grad_clip: Optional[float] = 1e-5,
                 turn_angle: int = 30,
                 sense_angle: int = 90,
                 turn_tolerance: float = 0.1):
        super().__init__(max_agents, scale, deposit, inertia, sense_offset,
                         noise_scale, normalized_grad, grad_clip)
        self._turn_angle = int(turn_angle)
        self._sense_angle = int(sense_angle)
        self._rtol = float(turn_tolerance)
        # fp32 constants shared with the oracle (python-float64 -> fp32 cast)
        self._turn_radians = np.float32(np.radians(turn_angle))
        self._sense_radians = np.float32(np.radians(sense_angle))
        self._atol = np.float32(float(np.radians(turn_angle))
                                * float(turn_tolerance))

    def init_params(self):
        p = super().init_params()
        p.update({"turn_angle": self._turn_angle,
                  "sense_angle": self._sense_angle,
                  "turn_tolerance": self._rtol})
        return p

    def _init_direction(self, direction):
        """Heading starts discretized to the turn lattice
        (core/agent/gradient.py:162-166)."""
        return discretize(direction, self._turn_radians)

    def _uses_direction_only(self) -> bool:
        # with normalized gradients the sensed magnitude dr is never
        # consumed (r = 1 below), so the turn needs only atan2(gy, gx)
        return self._normalized

    def _process_gradient(self, grad_xy, direction, key):
        """Discrete turn (core/agent/gradient.py:165-208)."""
        gpx, gpy = grad_xy
        dr = hypot2(gpx, gpy)
        drads = atan2(gpy, gpx)
        return self._turn_from_rads(drads, dr, direction, key)

    def _process_gradient_rads(self, drads, direction, key):
        """Single-field path: the gathered field-side atan2(gy, gx)."""
        return self._turn_from_rads(drads, None, direction, key)

    def _turn_from_rads(self, drads, dr, direction, key):
        # _choose_turn (core/agent/gradient.py:168-193)
        dir_delta = renormalize_radians(direction - drads)
        abs_drads = jnp.abs(drads)
        abs_delta = jnp.abs(dir_delta)
        # np.isclose(0, v, rtol, atol): |v| <= atol + rtol*|v|
        undetermined_grad = abs_drads <= (np.float32(1e-8)
                                          + np.float32(1e-5) * abs_drads)
        undetermined_turn = abs_delta <= (self._atol
                                          + np.float32(1e-2) * abs_delta)
        unseen_grad = abs_delta > self._sense_radians
        undetermined = undetermined_grad | undetermined_turn | unseen_grad

        bits = jr.bits(jr.fold_in(key, ch.TAG_DRAW_0), drads.shape, jnp.uint32)
        rand_choice = sign_from_bits(bits)

        dd = dir_delta * (~undetermined).astype(jnp.float32)
        turn = jnp.where(dd > self._atol, np.float32(-1.0), rand_choice)
        turn = jnp.where(dd < -self._atol, np.float32(1.0), turn)
        turn = turn * self._turn_radians

        deposit_mask = (~(undetermined_grad | undetermined_turn)).astype(
            jnp.float32)

        # new direction + back to unit vector (core/agent/gradient.py:195-208)
        directions = renormalize_radians(direction + turn)
        r = _F1 if self._normalized else dr
        nx, ny = polar2xy(r, directions)
        return (nx, ny), direction, deposit_mask

    def _process_deposit(self, sensed_food, deposit_mask):
        """deposit * food * clip(mask, 0.1, 1) (core/agent/gradient.py:210-214)."""
        mask = jnp.clip(deposit_mask, np.float32(0.1), _F1)
        return np.float32(self._deposit) * sensed_food * mask
