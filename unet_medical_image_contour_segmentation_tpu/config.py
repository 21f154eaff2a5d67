"""One dataclass-based config tree with CLI overrides.

The reference scatters configuration across per-script argparse blocks,
hardcoded module-top paths (``train.py:22-27``), comment-toggled model
selection (``train.py:250-261``) and inline loss weights (``train.py:134``,
``post_process.py:51``).  Here every knob is a named field (SURVEY.md §5
"Config / flag system").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["TrainConfig", "PostProcessConfig", "PipelineConfig", "add_dataclass_args", "dataclass_from_args"]


@dataclasses.dataclass
class TrainConfig:
    # model
    model: str = "unet_s"                  # unet | unet_t | unet_s | unet_sa
    n_channels: int = 1
    classes: int = 3
    bilinear: bool = False
    remat: bool = False                    # activation checkpointing (OOM fallback analogue)
    # data
    data_root: str = "data/data-without-black-shadow"
    scale: float = 0.5
    augment: bool = True
    num_workers: int = 8
    # optimization (reference train.py defaults)
    epochs: int = 5
    batch_size: int = 1
    learning_rate: float = 1e-5
    weight_decay: float = 1e-8
    momentum: float = 0.999
    gradient_clipping: float = 1.0
    amp: bool = True                       # bf16 MXU compute (TPU analogue of fp16 autocast)
    # loss (train.py:118-147)
    boundary_weight: float = 0.25
    boundary_edge_width: int = 51
    boundary_edge_weight: float = 15.0
    cc_loss: bool = False                  # opt-in connected-component penalty
                                           # (reference's commented train.py:124-132)
    # schedule (train.py:83,187)
    sched_t0: int = 4
    sched_t_mult: int = 2
    sched_eta_min: float = 1e-7
    scheduler_quirk: bool = True           # faithful step(val_score); False -> step(epoch)
    # checkpointing (train.py:208-220)
    save_checkpoint: bool = True
    dir_checkpoint: str = "./checkpoints"
    checkpoint_every: int = 5
    checkpoint_after_frac: float = 0.5
    load: Optional[str] = None
    # evaluation
    val_postprocess: bool = True
    predictions_dir: str = "./predictions"
    save_val_predictions: bool = True
    # parallelism
    num_devices: Optional[int] = None      # None -> all local devices
    spatial_shards: int = 1                # >1: shard image rows over a 2-D
                                           # (data, spatial) GSPMD mesh — for
                                           # scans whose activations exceed a
                                           # chip (parallel/spatial.py)
    # misc
    seed: int = 0
    log_every: int = 10
    sample_cache_bytes: int = 0            # >0: cache decoded+preprocessed
                                           # samples up to this many bytes so
                                           # epochs >= 2 skip host decode
                                           # (deterministic aug; 0 = off)
    disk_cache_dir: Optional[str] = None   # persistent decoded-sample .npz
                                           # cache (mtime-validated) — also
                                           # speeds epoch 1 and cross-run
                                           # starts, unlike the RAM cache
    nan_check_every: int = 1               # steps between NaN-guard/metric
                                           # fetches; >1 lets the device run
                                           # that many steps ahead (one
                                           # device_get per window) — key on
                                           # high-fetch-latency links; a NaN
                                           # still aborts within K+1 steps
    progress: bool = True                  # tqdm running-loss bar (auto-off on non-TTY)
    metrics_path: Optional[str] = None  # JSONL per-step/epoch metric log


@dataclasses.dataclass
class PostProcessConfig:
    min_area: int = 15000
    morph_kernel_size: int = 3


@dataclasses.dataclass
class PipelineConfig:
    """seg_main 5-stage pipeline knobs (seg_main.py:146-158)."""

    input_raw: str = ""
    output_root: str = "seg_results"
    width: int = 0
    height: int = 0
    window_width: int = 0
    window_length: int = 0
    model: str = ""
    target_size: int = 512
    int8: bool = False                     # quantized (PTQ) serving, stage 3
    int8_scales: Optional[str] = None      # persist/load calibration JSON


def add_dataclass_args(parser, cls, defaults=None):
    """Register every dataclass field as a --flag (bools get true/false)."""
    defaults = defaults or cls()
    for f in dataclasses.fields(cls):
        name = "--" + f.name.replace("_", "-")
        default = getattr(defaults, f.name)
        if f.type in ("bool", bool):
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default, metavar="{true,false}",
            )
        elif f.type in ("Optional[str]", "Optional[int]"):
            parser.add_argument(name, default=default)
        else:
            typ = {"int": int, "float": float, "str": str}.get(str(f.type), str)
            parser.add_argument(name, type=typ, default=default)
    return parser


def dataclass_from_args(cls, args):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in vars(args).items() if k in names})
