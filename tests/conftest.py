"""Test configuration.  Must run before jax is imported anywhere.

* CPU backend with 8 virtual devices so sharding/mesh tests run without real
  multi-chip hardware (SURVEY §4's fake-backend strategy).
* The bit-exactness verification configuration: fp32 trajectories are compared
  bit-for-bit against the NumPy oracle, which requires XLA:CPU to evaluate the
  contract arithmetic faithfully —
    - ``--xla_cpu_max_isa=AVX`` keeps the backend below FMA3, so mul+add
      chains cannot be contracted into differently-rounded fma instructions;
    - ``--xla_disable_hlo_passes=algsimp`` stops the HLO algebraic simplifier
      from value-changing rewrites (e.g. refolding ``1-(2u-1)`` into ``2-2u``).
  Production runs (bench.py on TPU) keep full optimization; measured on the
  real chip, every engine path still matches the oracle bit-for-bit
  (docs/PARITY.md "on-chip divergence", tools/tpu_parity.py — the one
  value-changing rewrite XLA:TPU applied, constant reassociation through
  wave_field, is pinned off with mathx.order_barrier).
"""
import os

# Force CPU: the ambient environment routes jax to the 'axon' TPU tunnel
# (JAX_PLATFORMS=axon) and pre-imports part of jax at interpreter startup, so
# the env var alone is captured too early — also update jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
for extra in ("--xla_force_host_platform_device_count=8",
              "--xla_cpu_max_isa=AVX",
              "--xla_disable_hlo_passes=algsimp"):
    if extra.split("=")[0] not in _flags:
        _flags = (_flags + " " + extra).strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
