"""Tests for the inference API (infer_mmae equivalent) and the DFC2023 data
pipeline (npy-sidecar backend)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu import infer as infer_lib
from incomplete_multimodal_fusion_tpu.data import dfc2023
from incomplete_multimodal_fusion_tpu.ops import masking
from tests.test_model import DOMAINS, IMG, NP_, PATCH, batch, tiny_model


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    x = batch(0)
    mi = masking.full_visible_mask_info(DOMAINS, (NP_,) * 3, 2)
    params = model.init(jax.random.PRNGKey(0), x, mi, 3 * NP_)["params"]
    return model, params


class TestInfer:
    def test_random_mask_deterministic_seed(self, model_and_params):
        """Fixed rng => reproducible masks+preds (infer_mmae.py:330 seed(1))."""
        model, params = model_and_params
        x = batch(1)
        r1 = infer_lib.infer(model, params, x, 24, rng=jax.random.PRNGKey(1))
        r2 = infer_lib.infer(model, params, x, 24, rng=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(r1.preds["s2"]), np.asarray(r2.preds["s2"]))

    def test_drop_modalities_api(self, model_and_params):
        """infer_mmae.py:344-361 modality-ablation equivalent."""
        model, params = model_and_params
        x = batch(2)
        res = infer_lib.infer(model, params, x, 32, drop_modalities=("dem",))
        assert np.asarray(res.task_masks["dem"]).all()  # fully masked
        assert not np.asarray(res.task_masks["s1"]).any()
        assert np.isfinite(np.asarray(res.preds["dem"])).all()

    def test_masked_input_zeroes_patches(self):
        x = jnp.ones((1, IMG, IMG, 1))
        mask = jnp.zeros((1, NP_), jnp.int32).at[0, 0].set(1)
        out = np.asarray(infer_lib.masked_input(x, mask, PATCH))
        assert out[0, :PATCH, :PATCH, 0].sum() == 0
        assert out.sum() == IMG * IMG - PATCH * PATCH

    def test_psnr(self):
        a = jnp.zeros((1, 8, 8, 1))
        assert float(infer_lib.psnr(a, a, data_range=1.0)) > 100
        b = jnp.ones((1, 8, 8, 1))
        np.testing.assert_allclose(float(infer_lib.psnr(a, b, data_range=1.0)), 0.0, atol=1e-4)

    def test_masked_psnr_only_masked_patches(self):
        pred = jnp.zeros((1, IMG, IMG, 1))
        tgt = jnp.zeros((1, IMG, IMG, 1))
        # corrupt one visible patch; masked-psnr must stay infinite-ish
        tgt = tgt.at[0, :PATCH, :PATCH, 0].set(5.0)
        mask = jnp.ones((1, NP_), jnp.int32).at[0, 0].set(0)
        v = float(infer_lib.masked_psnr(pred, tgt, mask, PATCH, data_range=1.0))
        assert v > 100


class TestDFC2023:
    @pytest.fixture()
    def tree(self, tmp_path):
        rng = np.random.default_rng(0)
        for sub in ("rgb", "sar", "dsm"):
            os.makedirs(tmp_path / sub)
        for i in range(5):
            np.save(tmp_path / "rgb" / f"t{i}.npy",
                    rng.uniform(0, 255, (3, 64, 64)).astype(np.float32))
            np.save(tmp_path / "sar" / f"t{i}.npy",
                    rng.uniform(0.001, 1.0, (1, 64, 64)).astype(np.float32))
            np.save(tmp_path / "dsm" / f"t{i}.npy",
                    rng.uniform(0, 100, (1, 64, 64)).astype(np.float32))
        return str(tmp_path)

    def test_normalization_semantics(self, tree):
        ds = dfc2023.DFC2023Dataset(tree, size=64)
        assert len(ds) == 5
        s = ds[0]
        # SAR: dB, clipped, z-scored => values in ((-25-mu)/sigma, (0-mu)/sigma)
        lo = (-25 - dfc2023.SAR_MEAN) / dfc2023.SAR_STD
        hi = (0 - dfc2023.SAR_MEAN) / dfc2023.SAR_STD
        assert s["s1"].min() >= lo - 1e-5 and s["s1"].max() <= hi + 1e-5
        # DSM: per-image standardized
        assert abs(s["dem"].mean()) < 1e-4 and abs(s["dem"].std() - 1.0) < 1e-3
        assert s["s2"].shape == (3, 64, 64)

    def test_iterator_nhwc_batches(self, tree):
        it = dfc2023.dfc2023_iterator(tree, ("s1", "s2", "dem"), batch_size=2,
                                      input_size=64, prefetch=1, num_threads=2)
        b = next(it)
        assert b["s2"].shape == (2, 64, 64, 3)
        assert b["s1"].shape == (2, 64, 64, 1)
        b2 = next(it)
        assert set(b2.keys()) == {"s1", "s2", "dem"}

    def test_resize_area_box_average(self):
        img = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
        out = dfc2023._resize_area(img, 2)
        np.testing.assert_allclose(out[0], [[2.5, 4.5], [10.5, 12.5]])
