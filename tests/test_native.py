"""Native C++ raster-ops parity tests vs the pure-numpy reference
implementations (the role ops/test.py plays for the reference's CUDA
extension: native kernel vs python core)."""
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.data import dfc2023
from incomplete_multimodal_fusion_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


class TestParity:
    def test_sar_normalize(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0.0001, 2.0, (1, 64, 64)).astype(np.float32)
        x[0, 3, 3] = np.nan
        got = native.sar_normalize(x)
        ref = 10 * np.log10(x + 1e-7)
        ref = np.clip(ref, -25, 0)
        ref = np.nan_to_num(ref)
        ref = (ref - dfc2023.SAR_MEAN) / dfc2023.SAR_STD
        np.testing.assert_allclose(got, ref.astype(np.float32), atol=1e-5)

    def test_rgb_normalize(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 255, (3, 32, 32)).astype(np.float32)
        got = native.rgb_normalize(x)
        ref = (x - dfc2023.RGB_MEAN[:, None, None]) / dfc2023.RGB_STD[:, None, None]
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_dsm_standardize(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 100, (1, 64, 64)).astype(np.float32)
        got = native.dsm_standardize(x)
        ref = (x - x.mean()) / np.sqrt(x.var() + 1e-6)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_box_resize(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 64, 64)).astype(np.float32)
        got = native.box_resize(x, 16)
        ref = dfc2023._resize_area(x, 16)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_batch_variants(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(0.001, 1.0, (8, 1, 32, 32)).astype(np.float32)
        got = native.sar_normalize_batch(x)
        ref = np.stack([native.sar_normalize(t) for t in x])
        np.testing.assert_allclose(got, ref, atol=1e-6)
        d = rng.uniform(0, 50, (8, 1, 32, 32)).astype(np.float32)
        got_d = native.dsm_standardize_batch(d)
        ref_d = np.stack([native.dsm_standardize(t) for t in d])
        np.testing.assert_allclose(got_d, ref_d, atol=1e-5)

    def test_loader_uses_native_with_same_result(self, tmp_path):
        """dfc2023 loaders with/without native give the same tensors."""
        import os

        rng = np.random.default_rng(5)
        for sub in ("rgb", "sar", "dsm"):
            os.makedirs(tmp_path / sub)
        np.save(tmp_path / "rgb" / "t.npy", rng.uniform(0, 255, (3, 64, 64)).astype(np.float32))
        np.save(tmp_path / "sar" / "t.npy", rng.uniform(0.001, 1, (1, 64, 64)).astype(np.float32))
        np.save(tmp_path / "dsm" / "t.npy", rng.uniform(0, 50, (1, 64, 64)).astype(np.float32))
        ds = dfc2023.DFC2023Dataset(str(tmp_path), size=64)
        s_native = ds[0]
        # force fallback
        import incomplete_multimodal_fusion_tpu.data.dfc2023 as d23
        orig = d23._native
        d23._native = lambda: None
        try:
            s_plain = ds[0]
        finally:
            d23._native = orig
        for k in ("s1", "s2", "dem"):
            np.testing.assert_allclose(s_native[k], s_plain[k], atol=1e-4)


def test_throughput_sane():
    """Native batch path should not be slower than numpy on a real batch."""
    import time

    rng = np.random.default_rng(0)
    x = rng.uniform(0.001, 1.0, (60, 1, 256, 256)).astype(np.float32)

    t0 = time.perf_counter()
    for _ in range(3):
        native.sar_normalize_batch(x)
    t_nat = time.perf_counter() - t0

    def ref(x):
        r = 10 * np.log10(x + 1e-7)
        r = np.clip(r, -25, 0)
        r = np.nan_to_num(r)
        return (r - dfc2023.SAR_MEAN) / dfc2023.SAR_STD

    t0 = time.perf_counter()
    for _ in range(3):
        ref(x)
    t_np = time.perf_counter() - t0
    print(f"native {t_nat*1e3:.1f}ms vs numpy {t_np*1e3:.1f}ms")
    assert t_nat < t_np * 2.0  # generous bound; typically much faster
