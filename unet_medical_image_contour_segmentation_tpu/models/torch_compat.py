"""PyTorch ``.pth`` checkpoint interop for the UNet family.

The reference saves/loads raw ``state_dict`` files with an extra
``mask_values`` entry (``train.py:208-216``, stripped on load at
``train.py:275-280`` / ``predict.py:107-108``).  For parity testing and for
users migrating trained checkpoints, this module maps the reference's
parameter names onto our NHWC pytrees and back.

Name map (reference ``unet/unet_parts.py`` / ``unet_model.py``):

    inc.double_conv.{0,3}.weight            -> inc/conv{1,2}/w        (OIHW->HWIO)
    inc.double_conv.{1,4}.{weight,bias,     -> inc/bn{1,2}/{scale,bias}
                           running_mean,var}   + state inc/bn{1,2}/{mean,var}
    down{i}.maxpool_conv.1.double_conv....  -> down{i}/...
    up{i}.up.{weight,bias}                  -> up{i}/upconv/{w,b}     (IOHW->HWIO)
    up{i}.conv.double_conv....              -> up{i}/conv/...
    up{i}.attention.conv1.weight            -> up{i}/att/conv/w
    outc.conv.{weight,bias}                 -> outc/{w,b}

Requires torch only when actually called (torch-cpu is an optional host dep).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = ["load_pth", "params_from_torch_state_dict", "state_dict_from_params"]


def _conv_w(t) -> np.ndarray:  # OIHW -> HWIO
    return np.asarray(t).transpose(2, 3, 1, 0)


def _convT_w(t) -> np.ndarray:  # (in, out, kh, kw) -> HWIO (I=in, O=out)
    return np.asarray(t).transpose(2, 3, 0, 1)


def _dc_prefixes(key: str) -> Dict[str, str]:
    """torch sub-names of a DoubleConv rooted at ``key``."""
    return {
        "conv1": f"{key}.0.weight",
        "bn1": f"{key}.1",
        "conv2": f"{key}.3.weight",
        "bn2": f"{key}.4",
    }


def _take_double_conv(sd: Dict[str, Any], key: str):
    names = _dc_prefixes(key)
    params = {
        "conv1": {"w": _conv_w(sd[names["conv1"]])},
        "conv2": {"w": _conv_w(sd[names["conv2"]])},
    }
    state = {}
    for bn in ("bn1", "bn2"):
        p = names[bn]
        params[bn] = {
            "scale": np.asarray(sd[f"{p}.weight"]),
            "bias": np.asarray(sd[f"{p}.bias"]),
        }
        state[bn] = {
            "mean": np.asarray(sd[f"{p}.running_mean"]),
            "var": np.asarray(sd[f"{p}.running_var"]),
        }
    return params, state


def params_from_torch_state_dict(
    sd: Dict[str, Any], *, bilinear: bool = False, use_attention: bool = False
) -> Tuple[dict, dict, Optional[list]]:
    """Convert a reference state_dict to ``(params, state, mask_values)``."""
    sd = dict(sd)
    mask_values = sd.pop("mask_values", None)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    params: dict = {}
    state: dict = {}
    params["inc"], state["inc"] = _take_double_conv(sd, "inc.double_conv")
    for i in range(1, 5):
        params[f"down{i}"], state[f"down{i}"] = _take_double_conv(
            sd, f"down{i}.maxpool_conv.1.double_conv"
        )
    for i in range(1, 5):
        p: dict = {}
        if not bilinear:
            p["upconv"] = {"w": _convT_w(sd[f"up{i}.up.weight"])}
            if f"up{i}.up.bias" in sd:
                p["upconv"]["b"] = np.asarray(sd[f"up{i}.up.bias"])
        conv_p, conv_s = _take_double_conv(sd, f"up{i}.conv.double_conv")
        p["conv"] = conv_p
        if use_attention or f"up{i}.attention.conv1.weight" in sd:
            p["att"] = {"conv": {"w": _conv_w(sd[f"up{i}.attention.conv1.weight"])}}
        params[f"up{i}"] = p
        state[f"up{i}"] = {"conv": conv_s}
    params["outc"] = {
        "w": _conv_w(sd["outc.conv.weight"]),
        "b": np.asarray(sd["outc.conv.bias"]),
    }
    return params, state, mask_values


def load_pth(path: str, *, bilinear: bool = False, use_attention: bool = False):
    """Load a reference ``.pth``/``.pt`` checkpoint into (params, state, mask_values).

    Accepts all three artifact kinds a reference deployment may hold:
    a raw ``state_dict`` (train.py:208-216), a whole pickled ``nn.Module``,
    or a TorchScript archive (``torch.jit.save``, loaded by the reference
    at predict.py:95-100) — the parameters are extracted host-side and
    mapped onto our pytrees.
    """
    import zipfile

    import torch

    # TorchScript archives are zips containing constants.pkl; eager
    # torch.save zips contain data.pkl.  Route on the actual artifact kind
    # instead of trying loaders in sequence, so a corrupt file surfaces the
    # loader's own error rather than a misleading one from the wrong loader.
    is_jit = False
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            is_jit = any(n.endswith("constants.pkl") for n in zf.namelist())
    if is_jit:
        sd = dict(torch.jit.load(path, map_location="cpu").state_dict())
    else:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict") and not isinstance(obj, dict):
            sd = dict(obj.state_dict())  # whole pickled module
        elif isinstance(obj, dict):
            # unwrap common {'state_dict': ...} checkpoint wrappers
            inner = obj.get("state_dict")
            sd = dict(inner) if isinstance(inner, dict) else obj
        else:
            raise ValueError(
                f"{path}: torch.load produced {type(obj).__name__}, expected a "
                "state_dict, a checkpoint dict, a pickled module, or a "
                "TorchScript archive"
            )
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    return params_from_torch_state_dict(
        sd, bilinear=bilinear, use_attention=use_attention
    )


def _put_double_conv(out: Dict[str, np.ndarray], key: str, params, state):
    out[f"{key}.0.weight"] = np.asarray(params["conv1"]["w"]).transpose(3, 2, 0, 1)
    out[f"{key}.3.weight"] = np.asarray(params["conv2"]["w"]).transpose(3, 2, 0, 1)
    for bn, idx in (("bn1", 1), ("bn2", 4)):
        out[f"{key}.{idx}.weight"] = np.asarray(params[bn]["scale"])
        out[f"{key}.{idx}.bias"] = np.asarray(params[bn]["bias"])
        out[f"{key}.{idx}.running_mean"] = np.asarray(state[bn]["mean"])
        out[f"{key}.{idx}.running_var"] = np.asarray(state[bn]["var"])
        out[f"{key}.{idx}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def state_dict_from_params(params, state, mask_values=None) -> Dict[str, np.ndarray]:
    """Export our pytrees as a reference-compatible state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    _put_double_conv(out, "inc.double_conv", params["inc"], state["inc"])
    for i in range(1, 5):
        _put_double_conv(
            out, f"down{i}.maxpool_conv.1.double_conv",
            params[f"down{i}"], state[f"down{i}"],
        )
    for i in range(1, 5):
        p = params[f"up{i}"]
        if "upconv" in p:
            out[f"up{i}.up.weight"] = np.asarray(p["upconv"]["w"]).transpose(2, 3, 0, 1)
            if "b" in p["upconv"]:
                out[f"up{i}.up.bias"] = np.asarray(p["upconv"]["b"])
        if "att" in p:
            out[f"up{i}.attention.conv1.weight"] = (
                np.asarray(p["att"]["conv"]["w"]).transpose(3, 2, 0, 1)
            )
        _put_double_conv(
            out, f"up{i}.conv.double_conv", p["conv"], state[f"up{i}"]["conv"]
        )
    out["outc.conv.weight"] = np.asarray(params["outc"]["w"]).transpose(3, 2, 0, 1)
    out["outc.conv.bias"] = np.asarray(params["outc"]["b"])
    if mask_values is not None:
        out["mask_values"] = mask_values
    return out
