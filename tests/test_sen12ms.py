"""SEN12MS/DFC2020 superpixel loader tests (synthetic tif/npy fixtures)."""
import os

import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.data import sen12ms


@pytest.fixture
def sen_root(tmp_path):
    root = tmp_path / "sen"
    (root / "ROIs_s1_town").mkdir(parents=True)
    (root / "ROIs_s2_town").mkdir()
    (root / "ROIs_se_town").mkdir()
    (root / "ROIs_dfc_town").mkdir()
    rng = np.random.default_rng(0)
    s1 = rng.uniform(-30, 5, (2, 64, 64)).astype(np.float32)
    s2 = rng.uniform(0, 12000, (13, 64, 64)).astype(np.float32)
    seg = np.repeat(np.repeat(np.arange(16).reshape(4, 4), 16, 0), 16, 1)
    lc = rng.integers(0, 10, (64, 64)).astype(np.uint8)
    # npy sidecars (no rasterio/tifffile in the test env — same gating as
    # data/dfc2023.py)
    np.save(root / "ROIs_s1_town" / "p1_s1_0.npy", s1)
    np.save(root / "ROIs_s2_town" / "p1_s2_0.npy", s2)
    np.save(root / "ROIs_se_town" / "p1_se_0.npy", seg)
    np.save(root / "ROIs_dfc_town" / "p1_dfc_0.npy", lc)
    return str(root)


def test_load_with_superpixels(sen_root):
    ds = sen12ms.SEN12MSDataset(sen_root, use_s2hr=True, use_s1=True,
                                use_superpixel=True, unlabeled=False)
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (6, 64, 64)  # 4 HR bands + 2 SAR
    assert s["segments"].shape == (64, 64)
    assert s["index"].shape == (6, 64, 64)
    assert s["label"].shape == (64, 64)
    # S2 part normalized to [0, 1]; S1 z-scored
    assert s["image"][:4].min() >= 0.0 and s["image"][:4].max() <= 1.0
    # index channel = per-superpixel mean: constant within each segment
    seg0 = s["segments"] == 0
    vals = s["index"][0][seg0]
    np.testing.assert_allclose(vals, vals[0], rtol=1e-6)
    np.testing.assert_allclose(vals[0], s["image"][0][seg0].mean(), rtol=1e-5)


def test_superpixel_crop_consistency(sen_root):
    ds = sen12ms.SEN12MSDataset(sen_root, use_s2hr=True, use_s1=False,
                                use_superpixel=True, crop_size=32, seed=3)
    s = ds[0]
    assert s["image"].shape == (4, 32, 32)
    assert s["segments"].shape == (32, 32)
    assert s["index"].shape == (4, 32, 32)
    # crop must slice all channels with the same window: index still
    # piecewise-constant on segments
    for sid in np.unique(s["segments"]):
        m = s["segments"] == sid
        v = s["index"][0][m]
        np.testing.assert_allclose(v, v[0], rtol=1e-6)


def test_band_selection_mr_lr(sen_root):
    ds = sen12ms.SEN12MSDataset(sen_root, use_s2hr=True, use_s2mr=True,
                                use_s2lr=True, use_s1=True)
    assert ds[0]["image"].shape[0] == 13 + 2
