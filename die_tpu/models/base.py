"""Policy (agent) interface — functional twin of ``Agent`` (core/agent/base.py:12-62).

A policy is a pure function of (params, policy_state, obs, key):

    action, policy_state' = policy.forward(params, pstate, obs, key)

* ``params``  — trainable pytree (None for rule-based policies)
* ``pstate``  — per-agent persistent state pytree (e.g. heading, prev_grad —
  the reference keeps these as mutable attributes, core/agent/gradient.py:42-43)
* ``obs``     — (agents f32[4,N], sensed_medium f32[3,W,H])
* ``key``     — the step's policy key; draw sites fold fixed tags from it
  (the RNG contract, see core/channels.py)

Like the reference (core/agent/static.py:28, gradient.py:123), policies return
raw actions — ``postprocess_action`` alive-masking is bypassed; the env's own
masking provides the semantics.

Persistence mirrors ``Agent.save/load`` (core/agent/base.py:28-43): JSON of
constructor params for rule-based policies; see die_tpu/models/nca.py for
parameterized models.
"""
from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Tuple

_REGISTRY: Dict[str, type] = {}


def register(cls):
    """Class decorator: make a policy JSON-loadable by name."""
    _REGISTRY[cls.__name__] = cls
    return cls


def postprocess_action(agents, action):
    """Alive-mask an action array — twin of ``Agent.postprocess_action``
    (core/agent/base.py:45-62).  Like the reference, policies do NOT apply
    this by default (callers return raw actions); it is provided for users
    who want explicit masking."""
    from die_tpu.core import channels as ch

    alive = (agents[ch.CH_AGT_ALIVE] > 0).astype(action.dtype)
    return action * alive[None, :]


class CallableModelPolicy:
    """Generic model-driven policy — the completed twin of the reference's
    ``ModelAgentSket`` stub (core/agent/learning.py:7-20): wrap an arbitrary
    callable ``model(obs) -> action`` as a Policy, applying the alive-mask
    postprocess the sketch intended (the step the reference left as TODO).

    ``model`` receives ``obs = (agents, medium)`` and returns a (3, N)
    action array; anything jittable works (a closure, a flax apply, ...).
    Not JSON-serializable (the model is arbitrary code) — mirror of the
    reference stub's ``model=None`` limitation, minus the crash.
    """

    def __init__(self, model=None):
        self.model = model

    def init_params(self):
        return {}

    def init_state(self, key):
        return None

    def init_model_params(self, key):
        return None

    def forward(self, params, pstate, obs, key):
        agents, _medium = obs
        if self.model is None:
            raise ValueError("CallableModelPolicy needs a model callable")
        action = self.model(obs)
        return postprocess_action(agents, action), pstate


class Policy:
    """Base policy.  Subclasses define ``init_state`` and ``forward``."""

    # True when forward() accepts a precomputed ``sensed_food`` kwarg (the
    # fused-sense rollout carry — core/env.py::env_step_carry)
    consumes_sensed_food = False

    def init_params(self) -> Dict[str, Any]:
        """Constructor kwargs from which the policy can be rebuilt."""
        raise NotImplementedError

    def init_state(self, key):
        """Initial per-agent policy state pytree (or None)."""
        return None

    def init_model_params(self, key):
        """Initial trainable params pytree (or None for rule-based)."""
        return None

    def forward(self, params, pstate, obs, key) -> Tuple[Any, Any]:
        raise NotImplementedError

    # ------------------------------------------------------------ persistence
    def save(self, file):
        """JSON round-trip of constructor params — core/agent/base.py:28-34."""
        data = json.dumps({"type": type(self).__name__,
                           "params": self.init_params()})
        if isinstance(file, (str, os.PathLike)):
            with open(file, "w") as f:
                f.write(data)
        else:
            file.write(data)

    @classmethod
    def load(cls, file) -> "Policy":
        """Rebuild any registered policy from JSON — core/agent/base.py:36-43."""
        if isinstance(file, (str, os.PathLike)):
            with open(file, "r") as f:
                payload = json.load(f)
        else:
            payload = json.load(file)
        if isinstance(payload, dict) and "type" in payload:
            klass = _REGISTRY[payload["type"]]
            return klass(**payload["params"])
        # bare-params file saved by a concrete class
        if cls is Policy:
            raise ValueError("cannot infer policy type from bare params")
        return cls(**payload)
