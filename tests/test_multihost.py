"""Multi-host data-parallel regression: 2 processes x 2 CPU devices == 1 process x 4.

The reference has no distributed runtime (SURVEY.md §2.7); our pod path is
``jax.distributed`` + a global 1-D data mesh with per-host input loading
(``DataLoader(process_slice=...)`` + ``assemble_global_batch``).  This test
launches two real OS processes that rendezvous through a local coordinator,
train one epoch on a shared synthetic dataset, and asserts both end in the
same parameter state as a single-process 4-device run of the same global
batch schedule.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = str(Path(__file__).resolve().parent.parent)

WORKER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    coordinator, nproc, pid, data_root, out_json = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
    )
    if nproc > 1:
        from unet_medical_image_contour_segmentation_tpu.parallel import distributed
        distributed.initialize(coordinator, num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc, "jax.distributed bootstrap failed"

    import numpy as np
    from unet_medical_image_contour_segmentation_tpu.config import TrainConfig
    from unet_medical_image_contour_segmentation_tpu.engine.train import train_model
    from unet_medical_image_contour_segmentation_tpu.parallel import distributed as D

    cfg = TrainConfig(
        model="unet_t", data_root=data_root, scale=1.0, epochs=1, batch_size=4,
        amp=False,  # f32: loss equality is then limited only by psum order
        num_devices=jax.device_count(), num_workers=2, save_checkpoint=False,
        save_val_predictions=False, val_postprocess=False, progress=False,
        metrics_path=out_json + ".metrics.jsonl",
    )
    state = train_model(cfg)
    params = D.local_replica(state.params)
    checksum = float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree.leaves(params)))
    losses = [
        json.loads(line)["loss"]
        for line in open(out_json + ".metrics.jsonl")
        if json.loads(line).get("kind") == "train_step"
    ]
    json.dump({"pid": pid, "checksum": checksum, "losses": losses}, open(out_json, "w"))
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(devices_per_proc: int):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch(nproc, pid, devices, coordinator, data_root, out_json, cwd):
    return subprocess.Popen(
        [sys.executable, "-c", WORKER % {"repo": REPO},
         coordinator, str(nproc), str(pid), data_root, out_json],
        env=_env(devices), cwd=cwd,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mhdata")
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        (root / "imgs" / split).mkdir(parents=True)
        (root / "masks" / split).mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (64, 64), dtype=np.uint8)).save(
                root / "imgs" / split / f"c{i}.png"
            )
            Image.fromarray(rng.choice([0, 128, 255], (64, 64)).astype(np.uint8)).save(
                root / "masks" / split / f"c{i}_mask.png"
            )
    return str(root)


def test_two_process_matches_single_process(dataset, tmp_path):
    coordinator = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    (tmp_path / "mh").mkdir()
    procs = [
        _launch(2, i, 2, coordinator, dataset, outs[i], str(tmp_path / "mh"))
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, l in zip(procs, logs):
        assert p.returncode == 0, f"multi-host worker failed:\n{l[-3000:]}"

    (tmp_path / "sp").mkdir()
    ref_out = str(tmp_path / "single.json")
    sp = _launch(1, 0, 4, coordinator, dataset, ref_out, str(tmp_path / "sp"))
    log = sp.communicate(timeout=900)[0]
    assert sp.returncode == 0, f"single-process worker failed:\n{log[-3000:]}"

    r0, r1 = (json.load(open(o)) for o in outs)
    ref = json.load(open(ref_out))

    # both hosts end bit-identical (replicated update), and the 2x2 run matches
    # the 1x4 run to float tolerance (same global batches, psum'd reductions)
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-7)
    assert r0["checksum"] == pytest.approx(ref["checksum"], rel=1e-5)
    assert len(r0["losses"]) == len(ref["losses"]) > 0
    np.testing.assert_allclose(r0["losses"], ref["losses"], rtol=1e-4, atol=1e-5)
