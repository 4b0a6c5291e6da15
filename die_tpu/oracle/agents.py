"""NumPy oracle policies — independent twins of die_tpu/models/{static,gradient}.

Eager NumPy implementations of the reference agents (core/agent/static.py,
core/agent/gradient.py) under the shared RNG/arithmetic contract, for
bit-for-bit trajectory comparison against the compiled engine.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from die_tpu.core import channels as ch
from die_tpu.core.mathx import (
    atan2,
    discretize,
    hypot2,
    normal_from_uniform,
    polar2xy,
    recip,
    renormalize_radians,
    round3,
)
from die_tpu.core.rng import (
    np_fold_in,
    np_random_bits,
    sign_from_bits,
    uniform01_from_bits,
)
from die_tpu.oracle.env import cells_of
from die_tpu.ops.gaussian import central_gradient

_F0 = np.float32(0.0)
_F1 = np.float32(1.0)


class OracleConstAgent:
    def __init__(self, delta_xy=(0.0, 0.0), deposit=0.0):
        self._row = np.array([delta_xy[0], delta_xy[1], deposit], np.float32)

    def forward(self, obs, key):
        agents, _medium = obs
        n = agents.shape[-1]
        return np.broadcast_to(self._row[:, None], (3, n)).copy()


class OracleBrownianAgent:
    def __init__(self, move_scale=0.01, deposit_scale=0.5):
        self._scale = float(move_scale)
        self._dep_scale = float(deposit_scale)

    def forward(self, obs, key):
        agents, _medium = obs
        n = agents.shape[-1]

        def draw(tag, a, b):
            u = round3(uniform01_from_bits(
                np_random_bits(np_fold_in(key, tag), (n,))))
            return np.float32(b - a) * u + np.float32(a)

        s = self._scale
        dx = draw(ch.TAG_DRAW_0, -s, s)
        dy = draw(ch.TAG_DRAW_1, -s, s)
        dep = draw(ch.TAG_DRAW_2, 0.0, self._dep_scale)
        alive = (agents[ch.CH_AGT_ALIVE] > _F0).astype(np.float32)
        return np.stack([dx, dy, dep]) * alive[None, :]


def _noise_2n(key, n):
    u = uniform01_from_bits(np_random_bits(key, (2, n)))
    return np.float32(0.4) * normal_from_uniform(u)


@dataclasses.dataclass
class OracleGradientAgent:
    max_agents: int = 10**6
    scale: float = 0.01
    deposit: float = 4.0
    inertia: float = 0.9
    sense_offset: float = 0.0
    noise_scale: float = 0.025
    normalized_grad: bool = True
    grad_clip: Optional[float] = 1e-5

    def init_state(self, key):
        noise = _noise_2n(np_fold_in(key, ch.TAG_DRAW_0), self.max_agents)
        direction = atan2(noise[1], noise[0])
        self.prev_grad = noise
        self.direction_rads = self._init_direction(direction)

    def _init_direction(self, direction):
        return direction

    def _gradient_field(self, chem):
        gx, gy = central_gradient(chem)
        norm = hypot2(gx, gy)
        if self.normalized_grad:
            # reference: nan_to_num(grad / norm) — 0/0 -> 0; contract recip
            pos = norm > _F0
            invn = recip(np.where(pos, norm, _F1))
            gx = np.where(pos, gx * invn, _F0)
            gy = np.where(pos, gy * invn, _F0)
        if self.grad_clip is not None:
            keep = (norm >= np.float32(self.grad_clip)).astype(np.float32)
            gx = gx * keep
            gy = gy * keep
        return gx, gy

    def _process_gradient(self, gpx, gpy, key):
        return gpx, gpy, None

    def _process_deposit(self, sensed_food, deposit_mask):
        return np.float32(self.deposit) * sensed_food

    def forward(self, obs, key):
        agents, medium = obs
        W, H = medium.shape[-2], medium.shape[-1]
        chem = medium[ch.CH_MED_CHEM]
        gx, gy = self._gradient_field(chem)

        off_x, off_y = polar2xy(np.float32(self.sense_offset),
                                self.direction_rads)
        cx = cells_of(agents[ch.CH_AGT_X] + off_x, W)
        cy = cells_of(agents[ch.CH_AGT_Y] + off_y, H)
        gpx = gx[cx, cy]
        gpy = gy[cx, cy]

        gpx, gpy, deposit_mask = self._process_gradient(gpx, gpy, key)

        inertia = np.float32(self.inertia)
        gpx = (_F1 - inertia) * gpx + inertia * self.prev_grad[0]
        gpy = (_F1 - inertia) * gpy + inertia * self.prev_grad[1]
        noise = _noise_2n(np_fold_in(key, ch.TAG_DRAW_1), agents.shape[-1])
        gpx = gpx + np.float32(self.noise_scale) * noise[0]
        gpy = gpy + np.float32(self.noise_scale) * noise[1]
        self.prev_grad = np.stack([gpx, gpy])
        self.direction_rads = atan2(gpy, gpx)

        ix = cells_of(agents[ch.CH_AGT_X], W)
        iy = cells_of(agents[ch.CH_AGT_Y], H)
        sensed_food = medium[ch.CH_MED_FOOD][ix, iy]
        deposit = self._process_deposit(sensed_food, deposit_mask)

        return np.stack([gpx * np.float32(self.scale),
                         gpy * np.float32(self.scale),
                         deposit])


@dataclasses.dataclass
class OraclePhysarumAgent(OracleGradientAgent):
    scale: float = 0.005
    inertia: float = 0.0
    sense_offset: float = 0.03
    noise_scale: float = 0.0
    turn_angle: int = 30
    sense_angle: int = 90
    turn_tolerance: float = 0.1

    def __post_init__(self):
        self.turn_radians = np.float32(np.radians(self.turn_angle))
        self.sense_radians = np.float32(np.radians(self.sense_angle))
        self.atol = np.float32(float(np.radians(self.turn_angle))
                               * float(self.turn_tolerance))

    def _init_direction(self, direction):
        return discretize(direction, self.turn_radians)

    def _process_gradient(self, gpx, gpy, key):
        direction = self.direction_rads
        drads = atan2(gpy, gpx)
        dr = hypot2(gpx, gpy)

        dir_delta = renormalize_radians(direction - drads)
        abs_drads = np.abs(drads)
        abs_delta = np.abs(dir_delta)
        undetermined_grad = abs_drads <= (np.float32(1e-8)
                                          + np.float32(1e-5) * abs_drads)
        undetermined_turn = abs_delta <= (self.atol
                                          + np.float32(1e-2) * abs_delta)
        unseen_grad = abs_delta > self.sense_radians
        undetermined = undetermined_grad | undetermined_turn | unseen_grad

        bits = np_random_bits(np_fold_in(key, ch.TAG_DRAW_0), drads.shape)
        rand_choice = sign_from_bits(bits)

        dd = dir_delta * np.logical_not(undetermined).astype(np.float32)
        turn = rand_choice.copy()
        turn[dd > self.atol] = -1.0
        turn[dd < -self.atol] = 1.0
        turn = turn * self.turn_radians

        deposit_mask = np.logical_not(
            undetermined_grad | undetermined_turn).astype(np.float32)

        directions = renormalize_radians(direction + turn)
        r = _F1 if self.normalized_grad else dr
        nx, ny = polar2xy(r, directions)
        return nx, ny, deposit_mask

    def _process_deposit(self, sensed_food, deposit_mask):
        mask = np.clip(deposit_mask, np.float32(0.1), _F1)
        return np.float32(self.deposit) * sensed_food * mask
