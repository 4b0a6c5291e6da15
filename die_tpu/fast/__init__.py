from die_tpu.fast.config import DIR_OFFSETS, NUM_DIRS, FastDynamics
from die_tpu.fast.env import FastEnvState, FastStepBits, fast_step
from die_tpu.fast.init import fast_init_jax, fast_init_np
from die_tpu.fast.rollout import (fast_rollout, fast_rollout_auto,
                                  oracle_fast_rollout)

__all__ = ["DIR_OFFSETS", "NUM_DIRS", "FastDynamics", "FastEnvState",
           "FastStepBits", "fast_step", "fast_init_jax", "fast_init_np",
           "fast_rollout", "fast_rollout_auto", "oracle_fast_rollout"]
