"""Multi-host runtime glue.

On a multi-host pod slice the same SPMD program runs in every host process:
``initialize()`` wires the jax distributed runtime, and the global mesh spans
all devices of all hosts.  Envs shard over the mesh exactly as on one host —
per-env keys are ``fold_in(master, global_env_index)``, so trajectories are
identical for any host count or mesh layout (tested single-host by
construction; the 8-virtual-device CPU mesh stands in for a pod in CI,
SURVEY §4's fake-backend strategy).

Stats aggregation crosses hosts through the same XLA reductions the
single-host path uses (jnp.sum over sharded arrays -> psum over ICI/DCN);
no NCCL/MPI analog is needed.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the jax distributed runtime (no-op on a single process).

    On TPU pods with standard env vars, bare ``jax.distributed.initialize()``
    autodetects everything.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_env_mesh(axis: str = "env") -> Mesh:
    """1-D mesh over every device of every host."""
    return Mesh(np.array(jax.devices()), (axis,))


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global env batch this host materializes when building
    sharded inputs with ``jax.make_array_from_process_local_data``."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
