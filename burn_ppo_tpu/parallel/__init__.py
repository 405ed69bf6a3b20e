from burn_ppo_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_rollout_carry,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_rollout_carry",
]
