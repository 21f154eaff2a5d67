"""Loss parity tests vs the reference torch implementations (values AND grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_medical_image_contour_segmentation_tpu.losses import (
    LossConfig,
    boundary_loss,
    compute_loss,
    connected_component_loss,
    dice_coeff,
    dice_loss,
)

torch = pytest.importorskip("torch")


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestDice:
    @pytest.mark.parametrize("reduce_first", [False, True])
    def test_dice_coeff_parity(self, reference_path, reduce_first):
        from utils.dice_score import dice_coeff as ref_dice

        p = np.abs(_rand(3, 16, 16, seed=1))
        t = (np.abs(_rand(3, 16, 16, seed=2)) > 0.8).astype(np.float32)
        expect = ref_dice(
            torch.from_numpy(p), torch.from_numpy(t), reduce_batch_first=reduce_first
        ).item()
        got = float(dice_coeff(jnp.asarray(p), jnp.asarray(t), reduce_batch_first=reduce_first))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_dice_empty_pair_scores_one(self):
        z = jnp.zeros((2, 8, 8))
        assert float(dice_coeff(z, z)) == pytest.approx(1.0)

    def test_multiclass_dice_loss_parity(self, reference_path):
        from utils.dice_score import dice_loss as ref_dice_loss

        import torch.nn.functional as F

        logits = _rand(2, 12, 12, 3, seed=3)
        targets = np.random.default_rng(4).integers(0, 3, (2, 12, 12))
        lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
        tt = torch.from_numpy(targets)
        expect = ref_dice_loss(
            F.softmax(lt, dim=1).float(),
            F.one_hot(tt, 3).permute(0, 3, 1, 2).float(),
            multiclass=True,
        ).item()
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        onehot = jax.nn.one_hot(jnp.asarray(targets), 3)
        got = float(dice_loss(probs, onehot, multiclass=True))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_dice_loss_gradient_parity(self, reference_path):
        from utils.dice_score import dice_loss as ref_dice_loss

        p = np.abs(_rand(2, 8, 8, seed=5))
        t = (np.abs(_rand(2, 8, 8, seed=6)) > 0.7).astype(np.float32)
        pt = torch.from_numpy(p).requires_grad_(True)
        ref_dice_loss(torch.sigmoid(pt), torch.from_numpy(t)).backward()
        expect = pt.grad.numpy()
        got = jax.grad(
            lambda x: dice_loss(jax.nn.sigmoid(x), jnp.asarray(t))
        )(jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-6)


class TestBoundary:
    @pytest.mark.parametrize("as_logits", [True, False])
    @pytest.mark.parametrize("target_vals", [(0, 1), (0, 128, 255)])
    def test_boundary_parity(self, reference_path, as_logits, target_vals):
        from utils.boundary_loss import boundary_loss as ref_boundary

        rng = np.random.default_rng(7)
        pred = _rand(2, 64, 64, seed=7) * (20.0 if as_logits else 0.05)
        if not as_logits:
            pred = 1 / (1 + np.exp(-pred))  # probabilities in (0,1)
        target = rng.choice(target_vals, (2, 64, 64)).astype(np.float32)
        expect = ref_boundary(
            torch.from_numpy(pred), torch.from_numpy(target),
            edge_width=13, edge_weight=5.0,
        ).item()
        got = float(
            boundary_loss(jnp.asarray(pred), jnp.asarray(target),
                          edge_width=13, edge_weight=5.0)
        )
        assert got == pytest.approx(expect, rel=1e-4, abs=1e-5)

    def test_boundary_multichannel_takes_channel_1(self, reference_path):
        from utils.boundary_loss import boundary_loss as ref_boundary

        pred = _rand(2, 32, 32, 3, seed=8) * 15
        target = (np.random.default_rng(9).random((2, 32, 32)) > 0.5) * 255.0
        expect = ref_boundary(
            torch.from_numpy(pred).permute(0, 3, 1, 2),
            torch.from_numpy(target.astype(np.float32)),
            edge_width=5, edge_weight=3.0,
        ).item()
        got = float(
            boundary_loss(jnp.asarray(pred), jnp.asarray(target),
                          edge_width=5, edge_weight=3.0)
        )
        assert got == pytest.approx(expect, rel=1e-4, abs=1e-5)

    def test_boundary_has_zero_gradient_like_torch(self, reference_path):
        """The reference boundary loss carries no gradient (see losses/boundary.py)."""
        from utils.boundary_loss import boundary_loss as ref_boundary

        pred = _rand(1, 32, 32, seed=10) * 20
        target = np.zeros((1, 32, 32), np.float32)
        pt = torch.from_numpy(pred).requires_grad_(True)
        out = ref_boundary(pt, torch.from_numpy(target), edge_width=5)
        assert not out.requires_grad  # torch: loss is detached from the graph
        g = jax.grad(
            lambda x: boundary_loss(x, jnp.asarray(target), edge_width=5)
        )(jnp.asarray(pred))
        assert float(jnp.abs(g).max()) == 0.0

    def test_boundary_jits(self):
        pred = jnp.asarray(_rand(2, 32, 32, seed=11) * 20)
        target = jnp.zeros((2, 32, 32))
        f = jax.jit(lambda p, t: boundary_loss(p, t, edge_width=5, edge_weight=15.0))
        assert np.isfinite(float(f(pred, target)))


class TestCompound:
    def test_multiclass_training_loss_parity(self, reference_path):
        """Full multiclass criterion == reference train.py:137-142."""
        import torch.nn.functional as F
        from utils.dice_score import dice_loss as ref_dice_loss

        logits = _rand(2, 32, 32, 3, seed=12) * 3
        targets = np.random.default_rng(13).integers(0, 3, (2, 32, 32))
        lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
        tt = torch.from_numpy(targets)
        expect = (
            torch.nn.CrossEntropyLoss()(lt, tt)
            + ref_dice_loss(
                F.softmax(lt, dim=1).float(),
                F.one_hot(tt, 3).permute(0, 3, 1, 2).float(),
                multiclass=True,
            )
        ).item()
        got, metrics = compute_loss(
            jnp.asarray(logits), jnp.asarray(targets), LossConfig(n_classes=3)
        )
        assert float(got) == pytest.approx(expect, rel=1e-5)
        assert set(metrics) == {"ce", "dice", "loss"}

    def test_binary_training_loss_parity(self, reference_path):
        """Full binary criterion == reference train.py:118-134 (incl. //2)."""
        from utils.boundary_loss import boundary_loss as ref_boundary
        from utils.dice_score import dice_loss as ref_dice_loss

        logits = _rand(2, 64, 64, 1, seed=14) * 5
        targets = np.random.default_rng(15).integers(0, 3, (2, 64, 64))
        lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
        tt = torch.from_numpy(targets).long()
        tt = tt // 2
        ttf = tt.float()
        expect = (
            torch.nn.BCEWithLogitsLoss()(lt.squeeze(1), ttf)
            + ref_dice_loss(torch.sigmoid(lt.squeeze(1)), ttf, multiclass=False)
            + 0.25 * ref_boundary(lt.squeeze(1), ttf, edge_width=51, edge_weight=15)
        ).item()
        got, _ = compute_loss(
            jnp.asarray(logits), jnp.asarray(targets), LossConfig(n_classes=1)
        )
        assert float(got) == pytest.approx(expect, rel=1e-4)


class TestConnectedComponent:
    def test_parity(self, reference_path):
        from utils.connected_component_loss import connected_component_loss as ref_ccl

        rng = np.random.default_rng(16)
        pred = np.zeros((2, 128, 128), np.float32)
        pred[0, 10:20, 10:20] = 0.9        # small component
        pred[0, 40:120, 40:120] = 0.8      # big central component
        pred[1, 0:60, 0:60] = 0.9          # big edge component
        expect = ref_ccl(torch.from_numpy(pred), edge_distance=30, min_area=500)
        expect = float(expect) if not hasattr(expect, "item") else expect.item()
        got = connected_component_loss(pred, edge_distance=30, min_area=500)
        assert got == pytest.approx(expect, rel=1e-6)


    def test_compound_opt_in_wiring(self):
        """cc_loss opt-in adds exactly the host penalty to the loss VALUE and
        leaves the gradient untouched (reference train.py:124-132, commented)."""
        import jax

        logits = jnp.asarray(
            np.random.default_rng(17).normal(size=(2, 64, 64, 1)).astype(np.float32)
        )
        targets = jnp.asarray(
            (np.random.default_rng(18).uniform(size=(2, 64, 64)) * 3).astype(np.int32)
        )
        base_cfg = LossConfig(n_classes=1)
        cc_cfg = LossConfig(n_classes=1, connected_component=True)

        lossfn = lambda cfg: (lambda lg: compute_loss(lg, targets, cfg))
        (l0, _), g0 = jax.jit(jax.value_and_grad(lossfn(base_cfg), has_aux=True))(logits)
        (l1, m1), g1 = jax.jit(jax.value_and_grad(lossfn(cc_cfg), has_aux=True))(logits)

        host_cc = connected_component_loss(
            np.asarray(jax.nn.sigmoid(logits[..., 0])), 50, 1000, 0.1
        )
        assert float(m1["cc"]) == pytest.approx(host_cc, rel=1e-6)
        assert float(l1) - float(l0) == pytest.approx(host_cc, rel=1e-5)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=0, atol=0)

    def test_compound_emit_probs_mode(self):
        """cc_emit_probs=True keeps the penalty out of the traced step (for
        PJRT plugins without host callbacks) and hands the caller the probs."""
        import jax

        logits = jnp.asarray(
            np.random.default_rng(19).normal(size=(2, 32, 32, 1)).astype(np.float32)
        )
        targets = jnp.asarray(
            (np.random.default_rng(20).uniform(size=(2, 32, 32)) * 3).astype(np.int32)
        )
        cfg = LossConfig(n_classes=1, connected_component=True, cc_emit_probs=True)
        (l, m), g = jax.jit(jax.value_and_grad(
            lambda lg: compute_loss(lg, targets, cfg), has_aux=True))(logits)
        l0, _ = compute_loss(logits, targets, LossConfig(n_classes=1))
        assert float(l) == pytest.approx(float(l0), rel=1e-6)  # loss untouched
        np.testing.assert_allclose(
            np.asarray(m["cc_probs"]), np.asarray(jax.nn.sigmoid(logits[..., 0])),
            rtol=1e-6, atol=0,
        )


def test_metric_keys_matches_compute_loss_every_branch():
    """metric_keys() is the shard_map out-spec contract: it must name exactly
    the keys compute_loss emits, for every config branch."""
    import itertools

    import jax.numpy as jnp

    from unet_medical_image_contour_segmentation_tpu.losses.compound import (
        LossConfig, compute_loss, metric_keys,
    )

    rng = np.random.default_rng(0)
    for n_classes, cc, emit, mc_boundary in itertools.product(
            (1, 3), (False, True), (False, True), (False, True)):
        cfg = LossConfig(n_classes=n_classes, connected_component=cc,
                         cc_emit_probs=emit, multiclass_boundary=mc_boundary)
        logits = jnp.asarray(rng.random((2, 16, 16, max(n_classes, 1)), np.float32))
        targets = jnp.asarray(rng.integers(0, 3, (2, 16, 16)))
        _, metrics = compute_loss(logits, targets, cfg)
        assert set(metrics) == set(metric_keys(cfg)), (
            n_classes, cc, emit, mc_boundary)
