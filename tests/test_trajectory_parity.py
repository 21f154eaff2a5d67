"""Trajectory-level convergence parity vs the torch reference.

Extends the 3-step parity check (test_train_engine.py) to a real training
*trajectory*: 60 optimization steps under the full binary compound loss
(BCE + Dice + 0.25*boundary — the reference's active path, train.py:118-134),
then multi-epoch cycles asserting the post-epoch evaluate triple and the
scheduler-quirk LR sequence against torch's actual
``CosineAnnealingWarmRestarts.step(val_score)`` object (train.py:83,186-187).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.evaluate import evaluate
from unet_medical_image_contour_segmentation_tpu.engine.optim import (
    RMSpropConfig, warm_restarts_lr,
)
from unet_medical_image_contour_segmentation_tpu.engine.train import (
    TrainState, make_train_step,
)
from unet_medical_image_contour_segmentation_tpu.losses.compound import LossConfig
from unet_medical_image_contour_segmentation_tpu.models import torch_compat
from unet_medical_image_contour_segmentation_tpu.models.unet import unet_t

torch = pytest.importorskip("torch")


def _blob_batch(seed, b=2, hw=64):
    """Structured data: blobs on noise so Dice/boundary see real regions."""
    rng = np.random.default_rng(seed)
    img = rng.normal(0.3, 0.1, (b, hw, hw, 1)).astype(np.float32)
    mask = np.ones((b, hw, hw), np.int64)
    for i in range(b):
        y0, x0 = rng.integers(4, hw - 24, 2)
        img[i, y0 : y0 + 16, x0 : x0 + 16, 0] += 0.5
        mask[i, y0 : y0 + 16, x0 : x0 + 16] = 2
    return {"image": np.clip(img, 0, 1), "mask": mask}


def _to_torch(batch):
    return (
        torch.from_numpy(batch["image"]).permute(0, 3, 1, 2),
        torch.from_numpy(batch["mask"]).long(),
    )


def _mirror_state(tmodel):
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    params, bn_state, _ = torch_compat.params_from_torch_state_dict(sd)
    return TrainState(
        params=jax.tree.map(jnp.asarray, params),
        bn_state=jax.tree.map(jnp.asarray, bn_state),
        opt_state={
            "square_avg": jax.tree.map(jnp.zeros_like, params),
            "momentum_buf": jax.tree.map(jnp.zeros_like, params),
        },
        step=jnp.zeros((), jnp.int32),
    )


def _torch_binary_loss(pred, true_masks, ref_dice_loss, ref_boundary_loss, criterion):
    """The reference's active binary criterion, train.py:118-134."""
    t = true_masks // 2
    loss = criterion(pred.squeeze(1), t.float())
    loss = loss + ref_dice_loss(torch.sigmoid(pred.squeeze(1)), t.float(), multiclass=False)
    loss = loss + 0.25 * ref_boundary_loss(
        pred.squeeze(1), t.float(), edge_width=51, edge_weight=15
    )
    return loss


def test_binary_loss_trajectory_60_steps(reference_path):
    """60 full RMSprop steps under BCE+Dice+0.25*boundary: per-step loss curve."""
    from unet.unet_model import UNet_T
    from utils.boundary_loss import boundary_loss as ref_boundary_loss
    from utils.dice_score import dice_loss as ref_dice_loss

    torch.manual_seed(0)
    tm = UNet_T(n_channels=1, n_classes=1, bilinear=False)
    state = _mirror_state(tm)
    # the reference default lr (train.py:226).  At 1e-4 the curves still track
    # but RMSprop's sign-flip sensitivity (see assert_params_close docstring)
    # accumulates to ~1.5% loss divergence by step 60; at the faithful 1e-5
    # the trajectory stays within rtol 1e-3 end to end.
    lr = 1e-5
    opt = torch.optim.RMSprop(tm.parameters(), lr=lr, weight_decay=1e-8, momentum=0.999)
    criterion = torch.nn.BCEWithLogitsLoss()

    model = unet_t(1, 1)
    step = jax.jit(make_train_step(
        model, LossConfig(n_classes=1), RMSpropConfig(learning_rate=lr), clipping=1.0
    ))

    tm.train()
    ours, theirs = [], []
    before_params = state.params
    for i in range(60):
        batch = _blob_batch(seed=i)
        img_t, msk_t = _to_torch(batch)
        pred = tm(img_t)
        loss = _torch_binary_loss(pred, msk_t, ref_dice_loss, ref_boundary_loss, criterion)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
        opt.step()

        state, metrics = step(state, batch, lr)
        ours.append(float(metrics["loss"]))
        theirs.append(loss.item())

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    # Measured drift profile (this exact config): rel error holds at 3-5e-4
    # through step ~50 with a late bump to 1.15e-3 — bounded, non-accumulating.
    # The floor is inherent: f32 reduction-order differences flip the sign of
    # near-zero gradients, and RMSprop turns any sign flip into a full
    # normalized step (square_avg starts at 0, so early steps are ~10*lr per
    # element regardless of |g|).  rtol 2e-3 over the curve + 1e-4 on the
    # first steps pins both the numerics and the trajectory shape.
    np.testing.assert_allclose(ours[:3], theirs[:3], rtol=1e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-4)
    # the curve must actually be a trajectory, not a flat line
    assert theirs[-1] != pytest.approx(theirs[0], rel=1e-3)

    # End-of-trajectory check is FUNCTIONAL: the two trained nets must agree
    # on data never trained on.  (Parameter-space divergence is real chaos —
    # measured median 1.9e-3 vs median movement 7.5e-3 at step 60, elements
    # random-walking in flat directions under momentum=0.999 — yet the loss
    # curves agree to 1e-3, i.e. the *functions* track.  Asserting parameters
    # element-wise at 60 steps would test f32 reduction ordering, not parity.)
    held_out = _blob_batch(seed=10_000)
    img_t, msk_t = _to_torch(held_out)
    tm.train()  # our step() runs train-mode BN; match it (batch statistics)
    with torch.no_grad():
        t_pred = tm(img_t)
    t_loss = _torch_binary_loss(
        t_pred, msk_t, ref_dice_loss, ref_boundary_loss, criterion
    ).item()
    _, j_metrics = step(state, held_out, 0.0)  # lr=0: evaluates without moving
    assert float(j_metrics["loss"]) == pytest.approx(t_loss, rel=5e-3)

    # loose parameter sanity: typical divergence well below typical movement
    final_sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    expect_params, _, _ = torch_compat.params_from_torch_state_dict(final_sd)
    diffs = np.concatenate([
        np.abs(np.asarray(g, np.float64) - np.asarray(w, np.float64)).ravel()
        for g, w in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(jax.tree.map(np.asarray, expect_params)))
    ])
    moved = np.concatenate([
        np.abs(np.asarray(w, np.float64) - np.asarray(b, np.float64)).ravel()
        for w, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, expect_params)),
                        jax.tree.leaves(jax.tree.map(np.asarray, before_params)))
    ])
    assert np.median(diffs) < 0.5 * max(np.median(moved), lr), (
        f"median divergence {np.median(diffs):.2e} vs median movement "
        f"{np.median(moved):.2e}"
    )


def test_epoch_cycle_evaluate_triple_and_lr_sequence(reference_path):
    """3 epochs x 8 steps (multiclass path): per-epoch evaluate triple parity
    and the quirk LR sequence vs torch's real scheduler object stepped with
    the Dice score (train.py:186-187)."""
    import torch.nn.functional as F
    from evaluate import evaluate as ref_evaluate
    from unet.unet_model import UNet_T
    from utils.dice_score import dice_loss as ref_dice_loss

    from test_evaluate_parity import _TorchLoader, _val_batches

    torch.manual_seed(1)
    tm = UNet_T(n_channels=1, n_classes=3, bilinear=False)
    state = _mirror_state(tm)
    base_lr = 1e-5  # reference default; higher lr amplifies RMSprop sign-flip chaos
    opt = torch.optim.RMSprop(tm.parameters(), lr=base_lr, weight_decay=1e-8,
                              momentum=0.999)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=4, T_mult=2, eta_min=1e-7
    )
    criterion = torch.nn.CrossEntropyLoss()

    model = unet_t(1, 3)
    step = jax.jit(make_train_step(
        model, LossConfig(n_classes=3), RMSpropConfig(learning_rate=base_lr),
        clipping=1.0,
    ))

    val_batches = _val_batches(seed=99)
    lr = base_lr
    lr_sequence_ours, lr_sequence_torch = [], []
    for epoch in range(3):
        tm.train()
        for i in range(8):
            batch = _blob_batch(seed=1000 * epoch + i)
            img_t, msk_t = _to_torch(batch)
            pred = tm(img_t)
            loss = criterion(pred, msk_t) + ref_dice_loss(
                F.softmax(pred, dim=1).float(),
                F.one_hot(msk_t, 3).permute(0, 3, 1, 2).float(),
                multiclass=True,
            )
            opt.zero_grad(set_to_none=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
            opt.step()

            state, metrics = step(state, batch, lr)
            assert float(metrics["loss"]) == pytest.approx(loss.item(), rel=5e-3)

        ref_triple = ref_evaluate(
            tm, _TorchLoader(val_batches), torch.device("cpu"), amp=False,
            epoch_pred_dir=None, postprocess=False,
        )
        our_triple = evaluate(
            model, state.params, state.bn_state, iter(val_batches),
            postprocess=False,
        )
        for got, want in zip(our_triple, ref_triple):
            want = want.item() if hasattr(want, "item") else float(want)
            assert got == pytest.approx(want, abs=2e-3), (epoch, our_triple, ref_triple)

        # the quirk: Dice score fed as the scheduler's epoch argument
        val_score = ref_triple[0].item() if hasattr(ref_triple[0], "item") else float(ref_triple[0])
        sched.step(val_score)
        lr_sequence_torch.append(opt.param_groups[0]["lr"])
        lr = float(warm_restarts_lr(our_triple[0], base_lr, T_0=4, T_mult=2,
                                    eta_min=1e-7))
        lr_sequence_ours.append(lr)

    np.testing.assert_allclose(lr_sequence_ours, lr_sequence_torch, rtol=1e-5)
    # A barely-trained net scores Dice 0, so the real-loop sequence is
    # (faithfully) constant at base_lr (cos(0) = 1).  Drive the SAME stateful
    # torch scheduler object on through non-zero scores to pin a non-trivial
    # score-dependent sequence too (parametric coverage: test_optim.py:73).
    for score in (0.31, 0.62, 0.87):
        sched.step(score)
        want = opt.param_groups[0]["lr"]
        got = float(warm_restarts_lr(score, base_lr, T_0=4, T_mult=2, eta_min=1e-7))
        assert got == pytest.approx(want, rel=1e-6), score
        lr_sequence_torch.append(want)
    assert len(set(np.round(lr_sequence_torch, 12))) > 1
