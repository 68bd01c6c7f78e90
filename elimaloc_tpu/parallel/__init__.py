from .sharding import (  # noqa: F401
    make_mesh,
    register_batch_2d,
    register_batch_dp,
    register_sharded,
    replay_fused_2d,
    replay_fused_dp,
    replay_fused_fleet,
    replay_fused_sp,
    replicate,
    stack_streams,
)
