"""True multi-process distributed test (SURVEY §4e): a 2-process CPU cluster
runs an env-sharded fast-engine rollout; per-env trajectories must be
bitwise identical to a single-process run."""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.rollout import fast_rollout

WORKER = os.path.join(os.path.dirname(__file__), "helpers",
                      "mp_rollout_worker.py")
SIZE = (16, 16)
B = 4
STEPS = 5


@pytest.mark.slow
def test_two_process_rollout_matches_single():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # workers manage their own platform; keep the virtual-device flag out so
    # each process exposes exactly one CPU device
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", "23789"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    rewards_mp = None
    for out in outs:
        for line in out.splitlines():
            if line.startswith("REWARDS"):
                vals = np.array([float(v) for v in line.split()[1:]],
                                np.float32).reshape(B, STEPS)
                if rewards_mp is None:
                    rewards_mp = vals
                else:
                    assert np.array_equal(rewards_mp, vals)
    assert rewards_mp is not None

    # single-process reference
    dyn = FastDynamics()
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[fast_init_jax(jr.fold_in(jr.PRNGKey(0), b), SIZE, dyn)
          for b in range(B)])
    keys = jnp.stack([jr.fold_in(jr.PRNGKey(1), b) for b in range(B)])
    _, rewards, _ = jax.jit(jax.vmap(
        lambda s, k: fast_rollout(dyn, s, k, STEPS)))(states, keys)
    # fp32 printed with 6 decimals — compare at print precision
    assert np.allclose(rewards_mp, np.asarray(rewards), atol=5e-5)
