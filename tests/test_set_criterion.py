"""Set criterion / Hungarian matcher tests (criterion_ins.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.losses import set_criterion as sc


def make_targets(b=2, g=4, h=16, w=16, k=3, seed=0, n_valid=(3, 2)):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, k, (b, g)).astype(np.int32)
    masks = (rng.random((b, g, h, w)) > 0.7).astype(np.float32)
    valid = np.zeros((b, g), bool)
    for i, nv in enumerate(n_valid):
        valid[i, :nv] = True
    labels[~valid] = -1
    return sc.SegTargets(jnp.asarray(labels), jnp.asarray(masks), jnp.asarray(valid))


def make_outputs(b=2, q=6, h=16, w=16, k=3, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "pred_logits": jnp.asarray(rng.standard_normal((b, q, k + 1)), jnp.float32),
        "pred_masks": jnp.asarray(rng.standard_normal((b, q, h, w)), jnp.float32),
    }


class TestPointSample:
    def test_matches_torch_point_sample(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        m = rng.standard_normal((3, 8, 8)).astype(np.float32)
        c = rng.random((3, 10, 2)).astype(np.float32)
        ours = sc.point_sample(jnp.asarray(m), jnp.asarray(c))
        ref = F.grid_sample(
            torch.from_numpy(m)[:, None], 2 * torch.from_numpy(c)[:, :, None] - 1,
            mode="bilinear", padding_mode="zeros", align_corners=False,
        )[:, 0, :, 0].numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    @pytest.mark.slow
    def test_uncertain_points_shape_and_range(self):
        logits = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8)), jnp.float32)
        pts = sc.uncertain_point_coords(jax.random.PRNGKey(0), logits, 16, 3.0, 0.75)
        assert pts.shape == (2, 16, 2)
        assert (np.asarray(pts) >= 0).all() and (np.asarray(pts) <= 1).all()


class TestMatcher:
    def test_exact_matches_scipy_direct(self):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.default_rng(2)
        cost = rng.random((2, 6, 4)).astype(np.float32)
        got = np.asarray(sc.hungarian_match(jnp.asarray(cost)))
        for b in range(2):
            row, col = linear_sum_assignment(cost[b])
            exp = np.zeros(4, np.int32)
            exp[col] = row
            np.testing.assert_array_equal(got[b], exp)

    def test_padding_does_not_disturb_real_matches(self):
        """Constant-cost dummy columns leave real assignments optimal."""
        rng = np.random.default_rng(3)
        from scipy.optimize import linear_sum_assignment

        real = rng.random((1, 8, 3)).astype(np.float32)
        padded = np.concatenate(
            [real, np.full((1, 8, 3), sc.PAD_COST, np.float32)], axis=2
        )
        got = np.asarray(sc.hungarian_match(jnp.asarray(padded)))[0, :3]
        row, col = linear_sum_assignment(real[0])
        exp = np.zeros(3, np.int32)
        exp[col] = row
        total_got = real[0][got, np.arange(3)].sum()
        total_exp = real[0][exp, np.arange(3)].sum()
        np.testing.assert_allclose(total_got, total_exp, rtol=1e-6)

    def test_greedy_is_permutation(self):
        rng = np.random.default_rng(4)
        cost = jnp.asarray(rng.random((2, 6, 4)), jnp.float32)
        got = np.asarray(sc.hungarian_match(cost, exact=False))
        for b in range(2):
            assert len(set(got[b].tolist())) == 4  # distinct queries

    def test_match_jit_with_callback(self):
        outputs = make_outputs()
        targets = make_targets()

        @jax.jit
        def run(o, t):
            return sc.match_outputs_to_targets(
                o["pred_logits"], o["pred_masks"], t, jax.random.PRNGKey(0), 32
            )

        m = run(outputs, targets)
        assert m.shape == (2, 4)


class TestCriterion:
    @pytest.mark.slow
    def test_full_criterion_finite_and_keys(self):
        outputs = make_outputs()
        outputs["aux_outputs"] = [make_outputs(seed=5)]
        targets = make_targets()
        losses = sc.set_criterion(
            outputs, targets, jax.random.PRNGKey(0), num_classes=3, num_points=32
        )
        for k in ("loss_ce", "loss_mask", "loss_dice",
                  "loss_ce_0", "loss_mask_0", "loss_dice_0"):
            assert k in losses and np.isfinite(float(losses[k])), k

    @pytest.mark.slow
    def test_perfect_prediction_low_loss(self):
        """Predictions equal to targets -> near-zero mask/dice losses.
        Block masks: point labels stay ~binary under bilinear sampling."""
        targets = make_targets(b=1, g=2, n_valid=(2,))
        block = np.zeros((1, 2, 16, 16), np.float32)
        block[0, 0, :, :8] = 1.0  # left half
        block[0, 1, :8, :] = 1.0  # top half
        targets = sc.SegTargets(targets.labels, jnp.asarray(block), targets.valid)
        logits = jnp.full((1, 4, 4), -10.0, jnp.float32)
        logits = logits.at[0, 0, int(targets.labels[0, 0])].set(10.0)
        logits = logits.at[0, 1, int(targets.labels[0, 1])].set(10.0)
        logits = logits.at[0, 2:, 3].set(10.0)  # no-object
        masks = jnp.full((1, 4, 16, 16), -20.0, jnp.float32)
        masks = masks.at[0, 0].set(jnp.where(targets.masks[0, 0] > 0, 20.0, -20.0))
        masks = masks.at[0, 1].set(jnp.where(targets.masks[0, 1] > 0, 20.0, -20.0))
        outputs = {"pred_logits": logits, "pred_masks": masks}
        losses = sc.set_criterion(
            outputs, targets, jax.random.PRNGKey(1), num_classes=3, num_points=64
        )
        assert float(losses["loss_ce"]) < 0.01
        # uncertainty sampling concentrates points on the mask boundary where
        # bilinear target labels are fractional -> small nonzero floor
        assert float(losses["loss_dice"]) < 0.2
        assert float(losses["loss_mask"]) < 0.2

    @pytest.mark.slow
    def test_gradients_flow(self):
        outputs = make_outputs()
        targets = make_targets()

        def loss_fn(pm):
            l = sc.set_criterion(
                {"pred_logits": outputs["pred_logits"], "pred_masks": pm},
                targets, jax.random.PRNGKey(2), num_classes=3, num_points=32,
            )
            return 0.3 * l["loss_ce"] + 0.4 * l["loss_mask"] + 0.3 * l["loss_dice"]

        g = jax.grad(loss_fn)(outputs["pred_masks"])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_semantic_targets_builder(self):
        lm = jnp.asarray([[[0, 1], [1, 2]]], jnp.int32)  # [1, 2, 2]
        t = sc.targets_from_semantic_labels(lm, num_classes=4)
        assert t.masks.shape == (1, 4, 2, 2)
        np.testing.assert_array_equal(np.asarray(t.valid[0]), [True, True, True, False])

    def test_dense_masks_mode(self):
        outputs = make_outputs()
        targets = make_targets()
        losses = sc.set_criterion(
            outputs, targets, jax.random.PRNGKey(3), num_classes=3,
            num_points=32, dense_masks=True,
        )
        assert np.isfinite(float(losses["loss_mask"]))


class TestAuctionMatcher:
    def test_auction_matches_scipy_cost(self):
        """On-device auction is epsilon-optimal: total assignment cost within
        1% of the exact scipy optimum (often identical)."""
        from scipy.optimize import linear_sum_assignment

        rng = np.random.default_rng(7)
        cost = rng.random((4, 20, 12)).astype(np.float32)
        got = np.asarray(sc.hungarian_match(jnp.asarray(cost), mode="auction"))
        for b in range(4):
            # valid permutation
            assert len(set(got[b].tolist())) == 12
            row, col = linear_sum_assignment(cost[b])
            opt = cost[b][row, col].sum()
            ours = cost[b][got[b], np.arange(12)].sum()
            assert ours <= opt * 1.01 + 1e-4, (ours, opt)

    def test_auction_under_jit(self):
        rng = np.random.default_rng(8)
        cost = jnp.asarray(rng.random((2, 10, 6)), jnp.float32)
        f = jax.jit(lambda c: sc.hungarian_match(c, mode="auction"))
        out = f(cost)
        assert out.shape == (2, 6)
