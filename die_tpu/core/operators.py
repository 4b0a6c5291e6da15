"""User-extensible operator registries: custom action-cost and food-flow
rules without editing the package.

The reference's ``Dynamics`` accepts *arbitrary callables* for the action
cost and food-flow operators (/root/reference/core/env.py:44-46; stateful
flow closures /root/reference/core/data_init.py:29-38).  Here configs are
frozen and hashable (jit-static), so operators are referenced BY NAME: a
config carries a string, the registry maps it to a callable at trace time.
Registration happens at import time of the user's module, so a config JSON
round-trips as long as the same modules are imported on load.

Operator contracts (both backend-generic: ``xp`` is ``numpy`` or
``jax.numpy`` and the function must use only ops available in both — the
same discipline as ``die_tpu.fast.env``.  Because the engine and the NumPy
oracle then run the *identical arithmetic*, bit-exact parity testing extends
to user operators automatically):

* cost operator — replaces the built-in linear cost
  (reference ``linear_action_cost``, core/env.py:29-35)::

      fn(xp, dynamics, action) -> burned    # f32[N] per-slot energy cost

  ``action`` is the f32[3, N] action array (dx, dy, deposit rows — see
  ``die_tpu.core.channels``).  Select it with ``Dynamics(cost_op="name")``.

* flow operator — replaces the built-in wave/perlin food flow
  (reference ``op_food_flow``, core/env.py:147-150; applied to the whole
  food field, full generality)::

      fn(xp, flow_cfg, food, flow_step) -> new_food   # f32[W, H]

  ``flow_cfg`` is the ``FlowConfig`` (custom kinds reuse its scale/decay/
  dt/... fields or close over their own constants); ``flow_step`` is the
  i32 step counter, which the engine advances by one per step for every
  non-``"none"`` kind.  Select it with ``FlowConfig(kind="name")``.

Each registration may carry an independent ``oracle_fn`` restatement: the
NumPy oracle then calls the restatement while the engine calls ``fn``, so a
parity test genuinely checks two implementations (the pattern the built-in
substeps follow).  Without one, the oracle calls the same backend-generic
``fn`` with ``xp=numpy``.

Under ``jax.jit`` the registered function runs at TRACE time (dynamics is a
static argument): no data-dependent Python control flow, static shapes —
the standard jit rules apply inside the operator body.

Custom kinds run on the XLA engine paths (``core.env``, ``fast.env``) and
the oracles; the Pallas lattice kernels and the sparse engine keep their
fixed built-in op set (a custom Python callable cannot lower into a Mosaic
kernel) and raise on unknown kinds.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional


class _Op(NamedTuple):
    fn: Callable
    oracle_fn: Callable


_COST_OPS: dict = {}
_FLOW_OPS: dict = {}

#: kinds handled natively by every engine (incl. Pallas) — not registrable
BUILTIN_FLOW_KINDS = ("none", "wave", "perlin")


def _register(table: dict, what: str, name: str, fn: Optional[Callable],
              oracle_fn: Optional[Callable]):
    if not isinstance(name, str) or not name:
        raise TypeError(f"{what} operator name must be a non-empty string")
    if what == "flow" and name in BUILTIN_FLOW_KINDS:
        raise ValueError(f"flow kind {name!r} is built in")

    def deco(f: Callable) -> Callable:
        table[name] = _Op(f, oracle_fn if oracle_fn is not None else f)
        return f

    return deco(fn) if fn is not None else deco


def register_cost_operator(name: str, fn: Callable = None, *,
                           oracle_fn: Callable = None):
    """Register ``fn(xp, dynamics, action) -> burned`` under ``name``.

    Usable as a decorator (``@register_cost_operator("mycost")``) or a
    direct call.  ``oracle_fn``, if given, is what the NumPy oracle runs
    instead (an independent restatement for two-implementation parity
    tests).  Re-registering a name overwrites it."""
    return _register(_COST_OPS, "cost", name, fn, oracle_fn)


def register_flow_operator(name: str, fn: Callable = None, *,
                           oracle_fn: Callable = None):
    """Register ``fn(xp, flow_cfg, food, flow_step) -> new_food`` under
    ``name`` (see module docstring for the contract)."""
    return _register(_FLOW_OPS, "flow", name, fn, oracle_fn)


def get_cost_operator(name: str, oracle: bool = False) -> Callable:
    try:
        op = _COST_OPS[name]
    except KeyError:
        raise KeyError(
            f"unknown cost operator {name!r} — register it with "
            f"die_tpu.core.operators.register_cost_operator (registered: "
            f"{sorted(_COST_OPS)})") from None
    return op.oracle_fn if oracle else op.fn


def get_flow_operator(name: str, oracle: bool = False) -> Callable:
    try:
        op = _FLOW_OPS[name]
    except KeyError:
        raise KeyError(
            f"unknown flow kind {name!r} — built-in kinds are "
            f"{BUILTIN_FLOW_KINDS}; register custom kinds with "
            f"die_tpu.core.operators.register_flow_operator (registered: "
            f"{sorted(_FLOW_OPS)})") from None
    return op.oracle_fn if oracle else op.fn
