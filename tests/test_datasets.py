"""Dataset tests: COCO-json instance pipeline (polygon rasterization) and
quadruplet loaders."""
import json
import os

import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.data import coco_instance as ci
from incomplete_multimodal_fusion_tpu.data import quadruplet as quad


class TestPolygonRaster:
    def test_square(self):
        poly = np.asarray([[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.0, 5.0]])
        m = ci.rasterize_polygon(poly, 8, 8)
        assert m.sum() == 16  # pixel centers 1.5..4.5 in both dims
        assert m[2, 2] and not m[0, 0] and not m[6, 6]

    def test_triangle_area(self):
        poly = np.asarray([[0.0, 0.0], [20.0, 0.0], [0.0, 20.0]])
        m = ci.rasterize_polygon(poly, 20, 20)
        assert abs(m.sum() - 200) < 20  # ~half the square

    def test_multi_polygon_union(self):
        segm = [[0, 0, 4, 0, 4, 4, 0, 4], [6, 6, 9, 6, 9, 9, 6, 9]]
        m = ci.masks_from_segmentation(segm, 10, 10)
        assert m[1, 1] and m[7, 7] and not m[5, 5]

    def test_rle_uncompressed(self):
        segm = {"counts": [3, 2, 95], "size": [10, 10]}
        m = ci.masks_from_segmentation(segm, 10, 10)
        # column-major: first 3 zeros then 2 ones in column 0
        assert m[3, 0] and m[4, 0] and not m[0, 0]
        assert m.sum() == 2


@pytest.fixture()
def coco_tree(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images" / "rgb"
    for sub in ("rgb", "sar", "dsm"):
        os.makedirs(tmp_path / "images" / sub)
    images, annotations = [], []
    for i in range(4):
        name = f"images/rgb/t{i}.npy"
        np.save(tmp_path / name, rng.uniform(0, 255, (3, 32, 32)).astype(np.float32))
        np.save(str(tmp_path / name).replace("rgb", "sar"),
                rng.uniform(0.01, 1, (1, 32, 32)).astype(np.float32))
        np.save(str(tmp_path / name).replace("rgb", "dsm"),
                rng.uniform(0, 50, (1, 32, 32)).astype(np.float32))
        images.append({"id": i, "file_name": name, "height": 32, "width": 32})
        annotations.append({
            "id": 10 + i, "image_id": i, "category_id": 1, "iscrowd": 0,
            "area": 64.0,
            "segmentation": [[4, 4, 12, 4, 12, 12, 4, 12]],
        })
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "building"}]}
    ann_path = tmp_path / "train.json"
    ann_path.write_text(json.dumps(coco))
    return str(tmp_path), str(ann_path)


class TestCocoDataset:
    def test_load_and_targets(self, coco_tree):
        root, ann = coco_tree
        ds = ci.CocoInstanceDataset(root, ann, img_size=32, max_instances=5)
        assert len(ds) == 4 and ds.num_classes == 1
        x, t = ds[0]
        assert x["s2"].shape == (32, 32, 3) and x["s1"].shape == (32, 32, 1)
        assert t.valid.sum() == 1 and t.labels[0] == 0
        assert t.masks[0].sum() == 64  # 8x8 square

    def test_batch_iterator(self, coco_tree):
        root, ann = coco_tree
        ds = ci.CocoInstanceDataset(root, ann, img_size=32, max_instances=5)
        it = ci.coco_batch_iterator(ds, batch_size=2, prefetch=1)
        batch, targets = next(it)
        assert batch["s2"].shape == (2, 32, 32, 3)
        assert targets.masks.shape == (2, 5, 32, 32)


@pytest.fixture()
def quad_tree(tmp_path):
    rng = np.random.default_rng(1)
    folder = tmp_path / "f1" / "s2_area"
    os.makedirs(folder)
    for sib in ("s1_area", "dem_area", "dnw_area", "lc_area"):
        os.makedirs(tmp_path / "f1" / sib)
    for i in range(3):
        np.save(folder / f"tile{i}.npy", rng.uniform(0, 10000, (13, 32, 32)).astype(np.float32))
        np.save(tmp_path / "f1" / "s1_area" / f"tile{i}.npy",
                rng.uniform(-30, 30, (2, 32, 32)).astype(np.float32))
        np.save(tmp_path / "f1" / "dem_area" / f"tile{i}.npy",
                rng.uniform(-200, 6000, (1, 32, 32)).astype(np.float32))
        np.save(tmp_path / "f1" / "dnw_area" / f"tile{i}.npy",
                rng.uniform(0, 9, (10, 32, 32)).astype(np.float32))
        lc_idx = rng.integers(0, 5, (32, 32))
        lc_rgb = quad.index_to_color(lc_idx).transpose(2, 0, 1).astype(np.float32)
        np.save(tmp_path / "f1" / "lc_area" / f"tile{i}.npy", lc_rgb)
    return str(tmp_path)


class TestQuadruplet:
    def test_normalization(self, quad_tree):
        ds = quad.QuadrupletDataset(quad_tree, places=["f1"])
        assert len(ds) == 3
        s = ds[0]
        assert s["s2"].shape == (4, 32, 32)
        assert s["s1"].shape == (2, 32, 32)
        # DEM min-max -> [0, 1]
        assert s["dem"].min() >= 0 and s["dem"].max() <= 1
        assert s["dnw"].dtype == np.int32

    def test_labeled_lc_roundtrip(self, quad_tree):
        ds = quad.QuadrupletDataset(quad_tree, places=["f1"], unlabeled=False)
        s = ds[0]
        assert "label" in s and s["label"].max() <= 27

    def test_crop_and_segm_downsample(self, quad_tree):
        ds = quad.QuadrupletDataset(quad_tree, places=["f1"], unlabeled=False,
                                    crop_size=16, segm_downsampling_rate=4)
        s = ds[0]
        assert s["s2"].shape == (4, 16, 16)
        assert s["label"].shape == (4, 4)

    def test_color_index_roundtrip(self):
        idx = np.arange(28).reshape(4, 7)
        rgb = quad.index_to_color(idx).transpose(2, 0, 1)
        back = quad.color_to_index(rgb)
        np.testing.assert_array_equal(back, idx)


class TestADEOdgt:
    @pytest.fixture()
    def tree(self, tmp_path):
        rng = np.random.default_rng(2)
        os.makedirs(tmp_path / "img"); os.makedirs(tmp_path / "ann")
        recs = []
        for i in range(3):
            np.save(tmp_path / "img" / f"i{i}.npy",
                    rng.uniform(0, 255, (48, 48, 3)).astype(np.float32))
            np.save(tmp_path / "ann" / f"i{i}.npy",
                    rng.integers(0, 10, (48, 48, 1)).astype(np.uint8))
            recs.append({"fpath_img": f"img/i{i}.npy", "fpath_segm": f"ann/i{i}.npy",
                         "width": 48, "height": 48})
        odgt = tmp_path / "training.odgt"
        odgt.write_text("\n".join(json.dumps(r) for r in recs))
        return str(tmp_path), str(odgt)

    def test_load_and_batch(self, tree):
        from incomplete_multimodal_fusion_tpu.data import ade_odgt

        root, odgt = tree
        ds = ade_odgt.ADEOdgtDataset(odgt, root=root, img_size=32,
                                     segm_downsampling_rate=4)
        assert len(ds) == 3
        s = ds[0]
        assert s["image"].shape == (32, 32, 3)
        assert s["label"].shape == (8, 8)
        it = ade_odgt.ade_batch_iterator(ds, 2, prefetch=1)
        b = next(it)
        assert b["image"].shape == (2, 32, 32, 3)
