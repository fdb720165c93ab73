"""Mesh construction and sharded drivers (pure data parallel over objects)."""

from .distributed import (  # noqa: F401
    initialize_distributed,
    launch_local_cluster,
)
from .io import (  # noqa: F401
    catalog_batches,
    catalog_from_process_shards,
    process_shard_bounds,
)
from .mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    model_sharded_fit_predict_step,
    replicate,
    ring_fit_predict_step,
    shard_models,
    shard_objects,
    sharded_fit_predict_step,
    sharded_logprob,
    stacked_nz,
)
