"""Multi-host initialization and per-host input sharding helpers.

The reference has no distributed runtime (SURVEY.md §2.7); the TPU-native
scale-out path is ``jax.distributed`` + XLA collectives: gradients all-reduce
over ICI within a slice and DCN across slices, with no hand-written comm
backend.  This module wraps process bootstrap and the per-host batch math so
``train_model(num_devices=jax.device_count())`` works unchanged on a pod:
each host feeds its local shard of the global batch and the shard_map train
step (parallel/data_parallel.py) sees one global mesh.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

__all__ = ["initialize", "local_batch_slice", "is_multi_host"]

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize with TPU-pod auto-detection.

    On Cloud TPU pods all arguments are discovered from the metadata server;
    pass them explicitly for other fabrics.  Safe to call when already
    initialized (no-op) or single-process (no-op unless args given).
    """
    # NOTE: do not touch jax.devices()/process_count() before initializing —
    # the first backend query pins the single-process runtime.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        log.info(
            "jax.distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except Exception as e:  # single-host runs keep working
        log.debug("jax.distributed.initialize skipped: %s", e)


def is_multi_host() -> bool:
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous sample range of a globally-ordered batch.

    Valid for 1-D data meshes built from ``jax.devices()`` (process-major
    device order), where process p owns rows [p*per_host, (p+1)*per_host).
    """
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def local_replica(tree):
    """Host-local copies of a fully-replicated global pytree.

    A replicated array on a multi-process mesh is not ``np.asarray``-able
    (its shards span non-addressable devices); this pulls each leaf's local
    replica so host-side code (evaluate, checkpoint save) can use it.
    Single-process arrays pass through as-is.
    """
    import jax.numpy as jnp

    def pull(x):
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            return jnp.asarray(x.addressable_data(0))
        return x

    return jax.tree.map(pull, tree)


def assemble_global_batch(batch, sharding):
    """Per-host local rows -> one global batch-sharded jax.Array per leaf.

    Each process feeds only its ``local_batch_slice`` of the globally-ordered
    batch; XLA never moves the rows — every device keeps what its host fed.
    """
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
