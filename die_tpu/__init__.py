"""die_tpu — a TPU-native (JAX/XLA/Pallas) vectorized engine with the
capabilities of gkirgizov/die: a multi-channel 2D foraging environment with
rule-based and learned agents, batched over thousands of lockstep envs and
sharded across device meshes.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  core/     — channel schema, frozen configs, pure-functional env step,
              state init, the RNG/arithmetic bit-contract
  models/   — policies: Const, Brownian, Gradient, Physarum, Neural-CA
  ops/      — stencil/conv/noise kernels (jnp reference + Pallas fast paths)
  parallel/ — fused scan rollouts, vmap batching, mesh sharding
  learn/    — JAX-native evolution strategies (PGPE / OpenAI-ES)
  render/   — device->host rendering, live plotting, GIF recording
  oracle/   — the seeded NumPy executable specification (test oracle)
  utils/    — checkpointing, metrics, profiling
"""

from die_tpu.core.config import Boundary, DiffuseMode, Dynamics, FlowConfig
from die_tpu.core.env import env_step, observe
from die_tpu.core.init import init_env_state
from die_tpu.core.operators import (register_cost_operator,
                                    register_flow_operator)
from die_tpu.core.state import EnvState, StepInfo

__version__ = "0.1.0"

__all__ = [
    "Boundary", "DiffuseMode", "Dynamics", "FlowConfig",
    "env_step", "observe", "init_env_state", "EnvState", "StepInfo",
    "register_cost_operator", "register_flow_operator",
    "__version__",
]
