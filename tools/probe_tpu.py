"""Tiny tunnel probe: one trivial jit, scalar-synced (CLAUDE.md: poll with
a tiny jit after a suspected tunnel wedge)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
x = jnp.ones((8, 128), jnp.float32)
v = float(np.asarray(jax.jit(lambda x: jnp.sum(x + 1.0))(x)))
print("probe ok", v, round(time.perf_counter() - t0, 1), "s",
      jax.default_backend())
