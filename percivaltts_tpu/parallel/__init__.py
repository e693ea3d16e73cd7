from percivaltts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_state,
    shard_batch,
)
