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

    def test_zero_predictions_is_a_miss_not_a_crash(self):
        """Images where every prediction was filtered out (common early in
        training) must count as pure misses (cocoeval.py tolerates empty
        dt lists)."""
        ev = CocoMaskEvaluator(num_classes=1)
        gt = np.zeros((1, 8, 8)); gt[0, :4] = 1
        ev.add_image(np.zeros((0, 8, 8)), np.zeros(0, np.int32),
                     np.zeros(0), gt, np.asarray([0]))
        s = ev.summarize()
        assert s["AP"] == pytest.approx(0.0)
        assert s["AP50"] == pytest.approx(0.0)

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


class TestCocoEvaluatorExtended:
    """Full cocoeval.py table coverage (VERDICT.md Weak #7): bbox IoU type,
    per-area breakdown, AR@maxDets."""

    def test_bbox_iou_type_perfect(self):
        from incomplete_multimodal_fusion_tpu.eval.coco_eval import (
            CocoMaskEvaluator, box_iou, boxes_from_masks,
        )

        gt = np.zeros((2, 16, 16))
        gt[0, 2:6, 3:9] = 1
        gt[1, 8:14, 1:5] = 1
        bx = boxes_from_masks(gt)
        np.testing.assert_allclose(bx[0], [3, 2, 9, 6])
        np.testing.assert_allclose(box_iou(bx, bx), np.eye(2), atol=1e-6)
        ev = CocoMaskEvaluator(num_classes=1, iou_type="bbox")
        ev.add_image(gt.copy(), np.asarray([0, 0]), np.asarray([0.9, 0.8]),
                     gt, np.asarray([0, 0]))
        assert ev.summarize()["AP"] == pytest.approx(1.0)

    def test_bbox_differs_from_segm(self):
        """An L-shaped GT vs its bounding box: bbox IoU 1.0, mask IoU < 0.75."""
        from incomplete_multimodal_fusion_tpu.eval.coco_eval import CocoMaskEvaluator

        gt = np.zeros((1, 16, 16))
        gt[0, 0:16, 0:4] = 1
        gt[0, 12:16, 0:16] = 1  # L shape
        pred = np.zeros((1, 16, 16))
        pred[0, 0:16, 0:16] = 1  # its bounding box
        for iou_type, expect_ap75 in (("bbox", 1.0), ("segm", 0.0)):
            ev = CocoMaskEvaluator(num_classes=1, iou_type=iou_type)
            ev.add_image(pred, np.asarray([0]), np.asarray([0.9]),
                         gt, np.asarray([0]))
            assert ev.summarize()["AP75"] == pytest.approx(expect_ap75), iou_type

    def test_area_breakdown(self):
        """A small (<32^2) and a large (>96^2) object: only the small one is
        predicted, so AP_small = 1 and AP_large = 0."""
        from incomplete_multimodal_fusion_tpu.eval.coco_eval import CocoMaskEvaluator

        h = w = 128
        gt = np.zeros((2, h, w))
        gt[0, :8, :8] = 1          # area 64 -> small
        gt[1, 10:110, 10:110] = 1  # area 10000 -> large
        pred = gt[:1]
        ev = CocoMaskEvaluator(num_classes=1)
        ev.add_image(pred, np.asarray([0]), np.asarray([0.9]),
                     gt, np.asarray([0, 0]))
        s = ev.summarize()
        assert s["AP_small"] == pytest.approx(1.0)
        assert s["AP_large"] == pytest.approx(0.0)
        assert s["AP"] == pytest.approx(0.5, abs=0.01)

    def test_ar_maxdets(self):
        """3 GT objects, correct preds ranked below a junk det: AR@1 sees
        only the junk (recall 0), AR@10 recovers all three."""
        from incomplete_multimodal_fusion_tpu.eval.coco_eval import CocoMaskEvaluator

        gt = np.zeros((3, 32, 32))
        gt[0, :8, :8] = 1
        gt[1, 12:20, 12:20] = 1
        gt[2, 24:32, 24:32] = 1
        junk = np.zeros((1, 32, 32))
        junk[0, :2, 30:] = 1
        preds = np.concatenate([junk, gt])
        ev = CocoMaskEvaluator(num_classes=1)
        ev.add_image(preds, np.zeros(4, np.int64),
                     np.asarray([0.99, 0.9, 0.8, 0.7]),
                     gt, np.zeros(3, np.int64))
        s = ev.summarize()
        assert s["AR@1"] == pytest.approx(0.0)
        assert s["AR@10"] == pytest.approx(1.0)

    def test_matched_to_out_of_range_gt_not_fp(self):
        """A det matching a large GT is IGNORED (not an FP) in the small-area
        sweep, so the small object's AP_small stays 1.0 even though the
        large det outscores it."""
        from incomplete_multimodal_fusion_tpu.eval.coco_eval import CocoMaskEvaluator

        h = w = 128
        gt = np.zeros((2, h, w))
        gt[0, :8, :8] = 1
        gt[1, 10:110, 10:110] = 1
        ev = CocoMaskEvaluator(num_classes=1)
        ev.add_image(gt.copy(), np.asarray([0, 0]), np.asarray([0.5, 0.9]),
                     gt, np.asarray([0, 0]))
        assert ev.summarize()["AP_small"] == pytest.approx(1.0)

    def test_json_has_bbox(self):
        from incomplete_multimodal_fusion_tpu.eval.coco_eval import (
            predictions_to_coco_json,
        )

        m = np.zeros((1, 8, 8), bool)
        m[0, 2:5, 1:4] = True
        res = predictions_to_coco_json(
            [7], [{"pred_masks": m, "pred_classes": np.asarray([0]),
                   "scores": np.asarray([0.7])}])
        assert res[0]["bbox"] == [1.0, 2.0, 3.0, 3.0]


def test_overlay_labels_and_outline():
    """Visualizer parity slice: outlines + class-name/score labels
    (utils/visualizer.py draw_instance_predictions role)."""
    from incomplete_multimodal_fusion_tpu.infer_segmentation import (
        overlay_instances,
    )

    img = np.zeros((48, 48, 3), np.float32)
    masks = np.zeros((1, 48, 48), np.float32)
    masks[0, 10:30, 10:30] = 1
    inst = {"pred_masks": masks, "scores": np.asarray([0.9]),
            "pred_classes": np.asarray([1])}
    out = overlay_instances(img, inst, class_names=["bg", "building"])
    assert out.shape == (48, 48, 3) and out.dtype == np.uint8
    assert out[20, 20].any()          # filled interior
    assert (out[10, 20] != out[5, 5]).any()  # outline differs from bg
    plain = overlay_instances(img, inst, draw_labels=False)
    assert (out != plain).any()       # label text rendered somewhere
