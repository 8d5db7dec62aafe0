from kiss_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    sharded_batch_query,
    sharded_pipeline_step,
    sharded_suffix_sort,
)
