"""Data-parallel training over a JAX device mesh.

The reference is strictly single-device (SURVEY.md §2.7); the idiomatic TPU
scale-out for this small conv net is batch sharding over a 1-D ``Mesh('data')``
with XLA collectives over ICI:

* the batch is sharded on axis 0, parameters/optimizer state are replicated;
* the train step runs under ``shard_map`` so BatchNorm can ``pmean`` its batch
  statistics across the mesh (cross-replica BN) and every loss term reduces
  over the *global* batch — data-parallel training is numerically equivalent
  to one device seeing the full batch (see losses/*, ops/nn.batch_norm);
* gradients are ``pmean``'d before the (replicated) RMSprop update, so
  parameters never diverge across shards.

Multi-host: under ``jax.distributed`` the same code path works with
``jax.make_mesh`` over all processes' devices; grads ride ICI within a slice
and DCN across slices — no hand-written comm backend (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.optim import RMSpropConfig
from ..engine.train import TrainState, make_train_step
from ..losses.compound import LossConfig

__all__ = [
    "make_data_mesh",
    "make_parallel_train_step",
    "make_parallel_eval_step",
    "batch_sharding",
    "replicate",
]

AXIS = "data"


def make_data_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(AXIS))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    if len(mesh.devices.flat) and s.is_fully_addressable:
        return jax.device_put(tree, s)

    # multi-host mesh: every process owns only some of the replicas; build
    # each global array from the (identical) host-local value
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def make_parallel_train_step(
    model,
    loss_cfg: LossConfig,
    opt_cfg: RMSpropConfig,
    mesh: Mesh,
    clipping: float = 1.0,
    donate: bool = True,
):
    """jitted (state, batch, lr) -> (state', metrics) over the data mesh.

    ``batch['image']``/``batch['mask']`` must have batch % mesh.size == 0 and
    should be placed with :func:`batch_sharding` (prefetch_to_device does).
    """
    step_fn = make_train_step(model, loss_cfg, opt_cfg, clipping, axis_name=AXIS)

    metrics_spec = P()
    if loss_cfg.connected_component and loss_cfg.cc_emit_probs \
            and loss_cfg.n_classes == 1:
        # metrics["cc_probs"] is the batch-sharded sigmoid map (the host-side
        # connected-component penalty input); every other metric is a
        # replicated scalar.  Keys come from compute_loss's own contract
        # (losses/compound.py:metric_keys, parity-tested) + the grad_norm/lr
        # step_fn adds.
        from ..losses.compound import metric_keys

        metrics_spec = {
            k: P() for k in (*metric_keys(loss_cfg), "grad_norm", "lr")
        }
        metrics_spec["cc_probs"] = P(AXIS)

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), {"image": P(AXIS), "mask": P(AXIS)}, P()),
        out_specs=(P(), metrics_spec),
        check_vma=True,  # collectives must prove the outputs are replicated
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_parallel_eval_step(model, n_classes: int, mesh: Mesh):
    """jitted sharded forward: (params, bn_state, image) -> class indices."""
    import jax.numpy as jnp

    def fwd(params, bn_state, image):
        logits, _ = model.apply(params, bn_state, image, train=False)
        if n_classes == 1:
            prob = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
            return (prob > 0.5).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    sharded = jax.shard_map(
        fwd, mesh=mesh, in_specs=(P(), P(), P(AXIS)), out_specs=P(AXIS)
    )
    return jax.jit(sharded)
