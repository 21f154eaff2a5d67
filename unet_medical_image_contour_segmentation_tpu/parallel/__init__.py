from .data_parallel import (
    batch_sharding,
    make_data_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate,
)
from .distributed import initialize as distributed_initialize, is_multi_host, local_batch_slice
from .spatial import (
    make_dp_spatial_mesh,
    make_spatial_forward,
    make_spatial_mesh,
    make_spatial_train_step,
    tiled_inference,
)

__all__ = [
    "batch_sharding",
    "make_data_mesh",
    "make_parallel_eval_step",
    "make_parallel_train_step",
    "replicate",
    "distributed_initialize",
    "is_multi_host",
    "local_batch_slice",
    "make_dp_spatial_mesh",
    "make_spatial_forward",
    "make_spatial_mesh",
    "make_spatial_train_step",
    "tiled_inference",
]
