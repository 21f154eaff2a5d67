"""Checkpoint save/restore: full train-state pytrees + torch .pth compat.

The reference is save-heavy / resume-light: it stores a bare state_dict with a
``mask_values`` entry every 5th epoch after the halfway point, and ``--load``
restores weights only (``train.py:208-216,275-280``).  We save the full state
(params + BN stats + optimizer state + step + mask_values) in a portable npz,
while ``.pth`` files are read/written through models/torch_compat for drop-in
compatibility with reference checkpoints.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "save_checkpoint_async",
    "load_checkpoint",
    "load_weights",
    "latest_checkpoint",
]

_SEP = "//"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_checkpoint(
    path: str,
    params,
    bn_state,
    opt_state=None,
    step: int = 0,
    mask_values=None,
    extra: Optional[dict] = None,
):
    """Write an .npz checkpoint (or a torch .pth when the path says so)."""
    if str(path).endswith(".pth"):
        from ..models.torch_compat import state_dict_from_params

        import torch

        sd = state_dict_from_params(params, bn_state, mask_values)
        sd = {
            k: (torch.from_numpy(np.asarray(v)) if isinstance(v, np.ndarray) else v)
            for k, v in sd.items()
        }
        torch.save(sd, path)
        return

    blobs: Dict[str, np.ndarray] = {}
    blobs.update({f"params{_SEP}{k}": v for k, v in _flatten(params).items()})
    blobs.update({f"bn_state{_SEP}{k}": v for k, v in _flatten(bn_state).items()})
    if opt_state is not None:
        blobs.update({f"opt_state{_SEP}{k}": v for k, v in _flatten(opt_state).items()})
    meta = {
        "step": int(step),
        "mask_values": mask_values,
        "extra": extra or {},
        "format": "umics-tpu-v1",
    }
    blobs["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **blobs)


def load_checkpoint(path: str):
    """Read an .npz checkpoint -> dict(params, bn_state, opt_state?, step, mask_values)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__")).decode())
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in flat.items():
        group, rest = key.split(_SEP, 1)
        groups.setdefault(group, {})[rest] = val
    out = {
        "params": _unflatten(groups.get("params", {})),
        "bn_state": _unflatten(groups.get("bn_state", {})),
        "opt_state": _unflatten(groups["opt_state"]) if "opt_state" in groups else None,
        "step": meta["step"],
        "mask_values": meta["mask_values"],
        "extra": meta.get("extra", {}),
    }
    return out


def load_weights(path: str, *, bilinear: bool = False, use_attention: bool = False):
    """Weights-only load (--load compat): .pth/.pt or .npz -> (params, bn_state, mask_values)."""
    if str(path).endswith((".pth", ".pt")):
        from ..models.torch_compat import load_pth

        return load_pth(path, bilinear=bilinear, use_attention=use_attention)
    ck = load_checkpoint(path)
    return ck["params"], ck["bn_state"], ck.get("mask_values")


def save_checkpoint_async(path, params, bn_state, opt_state=None, step=0,
                          mask_values=None, extra=None):
    """Non-blocking checkpoint save: device->host fetch happens on the caller
    thread (cheap, async dispatch), serialization and disk IO on a worker so
    the training loop never stalls on the filesystem.  Returns the Future."""
    import concurrent.futures

    host = jax.tree.map(np.asarray, (params, bn_state, opt_state))
    executor = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    fut = executor.submit(
        save_checkpoint, path, host[0], host[1], host[2],
        step=step, mask_values=mask_values, extra=extra,
    )
    executor.shutdown(wait=False)
    return fut


def latest_checkpoint(directory) -> Optional[str]:
    """Newest checkpoint_epoch*.npz / model_epoch*.npz in ``directory``."""
    import glob

    candidates = sorted(
        glob.glob(os.path.join(str(directory), "checkpoint_epoch*.npz"))
        + glob.glob(os.path.join(str(directory), "model_epoch*.npz")),
        key=os.path.getmtime,
    )
    return candidates[-1] if candidates else None
