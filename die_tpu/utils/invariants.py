"""Debug-mode state invariants — the rebuild of SURVEY §5.2 (the reference
resolves agent collisions implicitly through numpy scatter buffering and has
no sanitizers; here the duplicate semantics are explicit and these checks
assert the conservation laws that make them visible).

Host-side, numpy-based; intended for tests and debug loops, not the jitted
hot path."""
from __future__ import annotations

from typing import List

import numpy as np

from die_tpu.core import channels as ch


def check_env_state(state, dynamics=None) -> List[str]:
    """Exact-engine EnvState invariants.  Returns a list of violations."""
    v: List[str] = []
    medium = np.asarray(state.medium)
    agents = np.asarray(state.agents)
    occ = medium[ch.CH_MED_AGENTS]
    if not np.isfinite(medium).all():
        v.append("medium contains non-finite values")
    if not np.isfinite(agents).all():
        v.append("agents contains non-finite values")
    if set(np.unique(occ)) - {0.0, 1.0}:
        v.append("occupancy layer not binary")
    alive = agents[ch.CH_AGT_ALIVE] > 0
    x, y = agents[ch.CH_AGT_X], agents[ch.CH_AGT_Y]
    if alive.any():
        if x[alive].min() < 0 or x[alive].max() > 1 \
                or y[alive].min() < 0 or y[alive].max() > 1:
            v.append("alive agent coords outside [0, 1]")
    # every alive agent's cell is marked occupied (post-layout states)
    W, H = medium.shape[-2], medium.shape[-1]
    if alive.any() and occ.sum() > 0:
        ix = np.clip(np.floor(x[alive] * (W - 1) + 0.5), 0, W - 1).astype(int)
        iy = np.clip(np.floor(y[alive] * (H - 1) + 0.5), 0, H - 1).astype(int)
        if not np.all(occ[ix, iy] > 0):
            v.append("alive agent on unmarked cell (layout out of sync)")
    if medium[ch.CH_MED_CHEM].min() < 0:
        v.append("negative chem concentration")
    return v


def check_fast_state(state, dynamics=None, num_dirs: int = None) -> List[str]:
    """Fast-engine FastEnvState invariants.

    The heading bound follows the lattice: ``num_dirs`` explicitly, else
    ``dynamics.num_dirs``, else the 8-direction default."""
    if num_dirs is None:
        num_dirs = getattr(dynamics, "num_dirs", 8)
    v: List[str] = []
    occ = np.asarray(state.occ)
    dirf = np.asarray(state.dir)
    for name in ("occ", "dir", "agent_food", "env_food", "chem"):
        if not np.isfinite(np.asarray(getattr(state, name))).all():
            v.append(f"{name} contains non-finite values")
    if set(np.unique(occ)) - {0.0, 1.0}:
        v.append("occupancy not binary")
    d = dirf[occ > 0]
    if d.size and (d.min() < 0 or d.max() > num_dirs - 1
                   or not np.all(d == np.floor(d))):
        v.append(f"headings outside the {num_dirs}-direction lattice")
    if np.asarray(state.chem).min() < 0:
        v.append("negative chem concentration")
    return v


def assert_invariants(state, dynamics=None) -> None:
    """Raise AssertionError listing all violations (picks the checker by
    state type)."""
    checker = check_fast_state if hasattr(state, "occ") else check_env_state
    violations = checker(state, dynamics)
    assert not violations, "; ".join(violations)


def mass_conservation_delta(prev_state, new_state) -> float:
    """|Δ population| for the fast engine — must be 0 without agents_die."""
    return float(abs(np.asarray(new_state.occ).sum()
                     - np.asarray(prev_state.occ).sum()))
