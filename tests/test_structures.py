"""eval/structures.py — the Instances/Boxes/BitMasks/BoxMode surface the
reference drivers use (maskformer_train_ins_vit.py:357-362)."""
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.eval.structures import (
    BitMasks, Boxes, BoxMode, ImageList, Instances)


def test_imagelist_padding():
    a = np.ones((5, 7, 3), np.float32)
    b = np.full((9, 4, 3), 2.0, np.float32)
    il = ImageList.from_tensors([a, b], size_divisibility=8)
    assert il.tensor.shape == (2, 16, 8, 3)  # padded up to /8
    assert il.image_sizes == [(5, 7), (9, 4)]
    np.testing.assert_array_equal(il[0], a)
    np.testing.assert_array_equal(il[1], b)
    assert il.tensor[0, 5:, :, :].sum() == 0  # pad region


def test_boxes_ops():
    b = Boxes(np.array([[1, 2, 5, 6], [0, 0, 0, 0], [-2, -2, 300, 10]]))
    np.testing.assert_allclose(b.area(), [16.0, 0.0, 302 * 12])
    assert b.nonempty().tolist() == [True, False, True]
    b.clip((8, 10))  # h=8, w=10
    np.testing.assert_allclose(b.tensor[2], [0, 0, 10, 8])
    b.scale(2.0, 0.5)
    np.testing.assert_allclose(b.tensor[0], [2, 1, 10, 3])
    assert len(Boxes.cat([b, b])) == 6
    iou = Boxes(np.array([[0, 0, 4, 4]])).iou(Boxes(np.array([[2, 2, 6, 6]])))
    np.testing.assert_allclose(iou, [[4.0 / 28.0]])


def test_boxmode_roundtrip():
    xywh = np.array([[3.0, 4.0, 10.0, 20.0]])
    xyxy = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(xyxy, [[3, 4, 13, 24]])
    back = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(back, xywh)


def test_bitmasks_bounding_boxes():
    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True  # rows 2-4, cols 3-6
    bm = BitMasks(m)
    assert bm.nonempty().tolist() == [True, False]
    np.testing.assert_allclose(bm.area(), [12.0, 0.0])
    bb = bm.get_bounding_boxes()
    # boxes_from_masks convention: tight xyxy around the True pixels
    x0, y0, x1, y1 = bb.tensor[0]
    assert x0 == 3 and y0 == 2 and x1 >= 6 and y1 >= 4


def test_instances_container_and_dict_bridge():
    inst = Instances((16, 16))
    inst.scores = np.array([0.9, 0.2, 0.7])
    inst.pred_classes = np.array([1, 0, 1])
    inst.pred_boxes = Boxes(np.zeros((3, 4)))
    assert len(inst) == 3 and inst.has("scores")
    with pytest.raises(AssertionError):
        inst.bad = np.zeros(5)  # length mismatch rejected

    keep = inst.scores >= 0.5
    top = inst[keep]
    assert len(top) == 2 and top.pred_classes.tolist() == [1, 1]

    cat = Instances.cat([top, top])
    assert len(cat) == 4 and len(cat.pred_boxes) == 4

    # round-trip through the framework's plain instance dicts
    d = {"scores": np.array([0.8]), "pred_classes": np.array([0]),
         "pred_masks": np.zeros((1, 4, 4), np.float32)}
    inst2 = Instances.from_dict(d, (4, 4))
    assert isinstance(inst2.pred_masks, BitMasks)
    back = inst2.to_dict()
    assert back["pred_masks"].shape == (1, 4, 4)
    for inst_i in inst2:  # per-instance iteration
        assert len(inst_i) == 1
