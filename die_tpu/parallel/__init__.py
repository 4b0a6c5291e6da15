from die_tpu.parallel.mesh import (
    aggregate_stats,
    env_mesh,
    shard_env_batch,
    sharded_rollout_fn,
)
from die_tpu.parallel.rollout import (
    batch_keys,
    batched_rollout,
    policy_env_step,
    rollout,
)

__all__ = ["aggregate_stats", "env_mesh", "shard_env_batch",
           "sharded_rollout_fn", "batch_keys", "batched_rollout",
           "policy_env_step", "rollout"]
