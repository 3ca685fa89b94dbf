from wgsparkl_tpu.parallel.domain import (
    make_sharded_step,
    shard_state,
    shard_state_spatial,
    spatial_config,
    state_specs,
)

__all__ = [
    "make_sharded_step",
    "shard_state",
    "shard_state_spatial",
    "spatial_config",
    "state_specs",
]
