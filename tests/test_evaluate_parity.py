"""Golden parity: our evaluate() vs the reference evaluate() — same weights,
same data, comparing the full (dice, dice_postprocessed, min_dice) triple."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.evaluate import evaluate
from unet_medical_image_contour_segmentation_tpu.models import torch_compat
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

torch = pytest.importorskip("torch")


def _val_batches(seed=0, n_batches=2, b=2, hw=64):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        img = rng.normal(0.3, 0.1, (b, hw, hw, 1)).astype(np.float32)
        mask = np.ones((b, hw, hw), np.int64)
        for i in range(b):
            y0, x0 = rng.integers(4, hw - 24, 2)
            img[i, y0 : y0 + 16, x0 : x0 + 16, 0] += 0.5
            mask[i, y0 : y0 + 16, x0 : x0 + 16] = 2
        batches.append({"image": np.clip(img, 0, 1), "mask": mask})
    return batches


class _TorchLoader:
    """Wraps numpy batches as the reference dataloader contract."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for b in self.batches:
            yield {
                "image": torch.from_numpy(b["image"]).permute(0, 3, 1, 2),
                "mask": torch.from_numpy(b["mask"]),
            }


@pytest.mark.parametrize("postprocess", [False, True])
def test_evaluate_triple_matches_reference(reference_path, postprocess, tmp_path):
    from evaluate import evaluate as ref_evaluate
    from unet.unet_model import UNet_T

    torch.manual_seed(0)
    tmodel = UNet_T(1, 3, False)
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    params, bn_state, _ = torch_compat.params_from_torch_state_dict(sd)
    model = unet_t(1, 3)

    batches = _val_batches()
    ref = ref_evaluate(
        tmodel, _TorchLoader(batches), torch.device("cpu"), amp=False,
        epoch_pred_dir=None, postprocess=postprocess,
    )
    ours = evaluate(
        model, jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, bn_state),
        iter(batches), postprocess=postprocess,
    )
    for got, want in zip(ours, ref):
        want = float(want) if not hasattr(want, "item") else want.item()
        assert got == pytest.approx(want, abs=1e-4), (ours, ref)
