"""Optimizer/schedule parity vs torch.optim."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.engine.optim import (
    RMSpropConfig,
    clip_by_global_norm,
    init_rmsprop,
    rmsprop_update,
    warm_restarts_lr,
)

torch = pytest.importorskip("torch")


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_rmsprop_matches_torch_over_steps():
    """Reference hyperparameters, 10 steps, synthetic quadratic grads."""
    w0 = _rand(4, 3, seed=1)
    b0 = _rand(3, seed=2)

    wt = torch.from_numpy(w0.copy()).requires_grad_(True)
    bt = torch.from_numpy(b0.copy()).requires_grad_(True)
    opt = torch.optim.RMSprop(
        [wt, bt], lr=1e-5, weight_decay=1e-8, momentum=0.999, foreach=True
    )

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    cfg = RMSpropConfig()
    opt_state = init_rmsprop(params)

    def loss_t(w, b):
        return (w.square().sum() + (b * b * b).sum()) * 0.5

    for step in range(10):
        opt.zero_grad()
        loss_t(wt, bt).backward()
        opt.step()

        grads = jax.grad(
            lambda p: 0.5 * (jnp.square(p["w"]).sum() + (p["b"] ** 3).sum())
        )(params)
        params, opt_state = rmsprop_update(params, grads, opt_state, cfg, 1e-5)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["b"]), bt.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_clip_matches_torch():
    g = {"a": jnp.asarray(_rand(5, 5, seed=3) * 10), "b": jnp.asarray(_rand(7, seed=4))}
    ta = torch.from_numpy(np.asarray(g["a"]).copy()).requires_grad_(True)
    tb = torch.from_numpy(np.asarray(g["b"]).copy()).requires_grad_(True)
    ta.grad = ta.detach().clone()
    tb.grad = tb.detach().clone()
    total = torch.nn.utils.clip_grad_norm_([ta, tb], 1.0)

    clipped, ours_total = clip_by_global_norm(g, 1.0)
    assert float(ours_total) == pytest.approx(float(total), rel=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["a"]), ta.grad.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(clipped["b"]), tb.grad.numpy(), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize(
    "t", [0.0, 0.5, 0.93, 1.0, 3.9, 4.0, 5.5, 11.0, 12.0, 27.3, 28.0, 60.0]
)
def test_warm_restarts_matches_torch(t):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.RMSprop([p], lr=1e-5)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=4, T_mult=2, eta_min=1e-7
    )
    sched.step(t)
    expect = opt.param_groups[0]["lr"]
    got = float(warm_restarts_lr(t, 1e-5, T_0=4, T_mult=2, eta_min=1e-7))
    assert got == pytest.approx(expect, rel=1e-5)


def test_warm_restarts_quirk_mode_dice_argument():
    """Passing a Dice score (0..1) keeps lr in the top of the first cosine."""
    lr = float(warm_restarts_lr(0.9, 1e-5))
    assert 0.5e-5 < lr <= 1e-5
