from lsps_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated, shard_batch, shard_state,
    pjit_update, tp_param_shardings, shard_state_tp,
)
