from videonavqa_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, opt_state_shardings, param_shardings,
    put_global, replicate, shard_batch,
)
