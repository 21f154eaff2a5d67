from .data_parallel import (
    batch_sharding,
    make_data_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate,
)

__all__ = [
    "batch_sharding",
    "make_data_mesh",
    "make_parallel_eval_step",
    "make_parallel_train_step",
    "replicate",
]
