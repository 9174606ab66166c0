"""COCO-style AP evaluator + ResNet-backbone MaskFormer tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.eval.coco_eval import (
    CocoMaskEvaluator,
    mask_iou,
    predictions_to_coco_json,
)


class TestMaskIoU:
    def test_basic(self):
        a = np.zeros((1, 4, 4)); a[0, :2] = 1
        b = np.zeros((2, 4, 4)); b[0, :2] = 1; b[1, :1] = 1
        iou = mask_iou(a, b)
        np.testing.assert_allclose(iou[0], [1.0, 0.5])


class TestCocoEvaluator:
    def test_perfect_predictions(self):
        ev = CocoMaskEvaluator(num_classes=2)
        gt = np.zeros((2, 8, 8)); gt[0, :4] = 1; gt[1, 4:] = 1
        ev.add_image(gt.copy(), np.asarray([0, 1]), np.asarray([0.9, 0.8]),
                     gt, np.asarray([0, 1]))
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)
        assert s["AP50"] == pytest.approx(1.0)

    def test_half_iou_counts_only_at_low_thresholds(self):
        ev = CocoMaskEvaluator(num_classes=1)
        gt = np.zeros((1, 8, 8)); gt[0, :4] = 1
        pred = np.zeros((1, 8, 8)); pred[0, :2] = 1  # IoU 0.5
        ev.add_image(pred, np.asarray([0]), np.asarray([0.9]), gt, np.asarray([0]))
        s = ev.summarize()
        assert s["AP50"] == pytest.approx(1.0)
        assert s["AP75"] == pytest.approx(0.0)
        assert 0 < s["AP"] < 0.3

    def test_false_positive_lowers_ap(self):
        ev = CocoMaskEvaluator(num_classes=1)
        gt = np.zeros((1, 8, 8)); gt[0, :4] = 1
        preds = np.stack([gt[0], np.roll(gt[0], 4, axis=0) * 0 + np.eye(8)])
        # second pred is junk with HIGHER score
        ev.add_image(preds, np.asarray([0, 0]), np.asarray([0.5, 0.9]),
                     gt, np.asarray([0]))
        s = ev.summarize()
        assert s["AP50"] < 1.0

    def test_missing_class_excluded(self):
        ev = CocoMaskEvaluator(num_classes=3)
        gt = np.zeros((1, 8, 8)); gt[0, :4] = 1
        ev.add_image(gt.copy(), np.asarray([0]), np.asarray([0.9]), gt, np.asarray([0]))
        s = ev.summarize()
        assert s["AP"] == pytest.approx(1.0)  # classes 1,2 have no GT -> excluded
        assert s["per_class_AP"][1] == -1.0

    def test_json_rle_roundtrip(self):
        from incomplete_multimodal_fusion_tpu.data.coco_instance import (
            masks_from_segmentation,
        )

        m = np.zeros((6, 6), bool); m[1:4, 2:5] = True
        res = [{"pred_masks": m[None], "pred_classes": np.asarray([0]),
                "scores": np.asarray([0.7])}]
        js = predictions_to_coco_json([42], res)
        assert js[0]["image_id"] == 42 and js[0]["category_id"] == 1
        back = masks_from_segmentation(js[0]["segmentation"], 6, 6)
        np.testing.assert_array_equal(back, m)


class TestResNetMaskFormer:
    @pytest.mark.slow
    def test_forward(self):
        from incomplete_multimodal_fusion_tpu.models.maskformer import (
            MaskFormerConfig, MaskFormerModel,
        )

        cfg = MaskFormerConfig(
            image_size=64, num_classes=2, conv_dim=32, mask_dim=32,
            transformer_enc_layers=1, num_queries=8, dec_layers=3,
            dim_feedforward=64, backbone_type="resnet18",
        )
        model = MaskFormerModel(cfg)
        r = np.random.default_rng(0)
        x = {"s2": jnp.asarray(r.standard_normal((2, 64, 64, 3)), jnp.float32),
             "s1": jnp.zeros((2, 64, 64, 1)), "dem": jnp.zeros((2, 64, 64, 1))}
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        assert "conv1" in params["backbone"]
        out = model.apply({"params": params}, x)
        assert out["pred_logits"].shape == (2, 8, 3)
        assert out["pred_masks"].shape[-2:] == (16, 16)  # stride-4 res2
        assert np.isfinite(np.asarray(out["pred_masks"])).all()

    @pytest.mark.slow
    def test_resnet_stage_shapes(self):
        from incomplete_multimodal_fusion_tpu.models.resnet import ResNet

        model = ResNet(depth=50)
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(params, x)
        assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
        assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
