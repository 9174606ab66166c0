"""Downstream model tests: ViTBaseline pyramid, pixel decoder, Mask2Former
decoder, full MaskFormerModel forward, incomplete-modality training mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.maskformer import (
    MaskFormerConfig,
    MaskFormerModel,
)
from incomplete_multimodal_fusion_tpu.models.vit_baseline import ViTBaseline
from incomplete_multimodal_fusion_tpu.ops import masking

DOMAINS = ("s1", "s2", "dem")
IMG = 64
NP_ = 16
CH = {"s1": 1, "s2": 3, "dem": 1}

CFG = MaskFormerConfig(
    in_domains=DOMAINS,
    image_size=IMG,
    patch_size=16,
    num_classes=3,
    dim_tokens=32,
    depth=4,
    dim_head=8,
    heads=2,
    num_fusion_tokens=NP_,
    conv_dim=32,
    mask_dim=32,
    transformer_enc_layers=1,
    num_queries=10,
    dec_layers=3,
    dim_feedforward=64,
)


def batch(seed, b=2):
    r = np.random.default_rng(seed)
    return {d: jnp.asarray(r.standard_normal((b, IMG, IMG, CH[d])), jnp.float32) for d in DOMAINS}


@pytest.fixture(scope="module")
def model_and_params():
    model = MaskFormerModel(CFG)
    x = batch(0)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


class TestViTBaseline:
    def test_pyramid_shapes(self):
        bb = ViTBaseline(in_domains=DOMAINS, image_size=IMG, patch_size=16,
                         dim_tokens=32, depth=4, dim_head=8, heads=2,
                         num_fusion_tokens=NP_)
        x = batch(1)
        mi = masking.full_visible_mask_info(DOMAINS, (NP_,) * 3, 2)
        params = bb.init(jax.random.PRNGKey(0), x, mi, 3 * NP_)["params"]
        feats = bb.apply({"params": params}, x, mi, 3 * NP_)
        # grid 4x4 -> up 4x, 2x, 1x, 0.5x (multimae_big_imcomplete.py:666-680)
        assert feats[0].shape == (2, 16, 16, 32)
        assert feats[1].shape == (2, 8, 8, 32)
        assert feats[2].shape == (2, 4, 4, 32)
        assert feats[3].shape == (2, 2, 2, 32)

    def test_tap_layers(self):
        bb = ViTBaseline(depth=12)
        assert bb.tap_layers == [2, 5, 8, 11]  # :428 formula

    @pytest.mark.slow
    def test_absent_modality_invariance(self):
        """present=[1,0,1]: changing s2 input must not change features."""
        bb = ViTBaseline(in_domains=DOMAINS, image_size=IMG, patch_size=16,
                         dim_tokens=32, depth=2, dim_head=8, heads=2,
                         num_fusion_tokens=NP_)
        e = 32
        key = jax.random.PRNGKey(0)
        present = jnp.asarray([True, False, True])
        mi = masking.incomplete_random_masks(
            key, DOMAINS, (NP_,) * 3, present, e, 2, keep_ratio=0.9
        )
        xa = batch(2)
        params = bb.init(jax.random.PRNGKey(1), xa, mi, e, present=present)["params"]
        xb = dict(xa, s2=xa["s2"] * -7.0 + 3.0)
        fa = bb.apply({"params": params}, xa, mi, e, present=present)
        fb = bb.apply({"params": params}, xb, mi, e, present=present)
        for a, b_ in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    def test_incomplete_mask_budget(self):
        present = jnp.asarray([True, False, True])
        mi = masking.incomplete_random_masks(
            jax.random.PRNGKey(2), DOMAINS, (NP_,) * 3, present, 32, 1, keep_ratio=0.9
        )
        # 0.9 * 32 present tokens = 28 visible
        assert int(mi.num_visible[0]) == 28
        assert np.asarray(mi.task_masks["s2"]).all()  # absent fully masked

    def test_sample_modality_subset(self):
        counts = np.zeros(3)
        for i in range(50):
            s = masking.sample_modality_subset(jax.random.PRNGKey(i), 3)
            k = int(np.asarray(s).sum())
            assert 1 <= k <= 3
            counts[k - 1] += 1
        assert (counts > 0).all()  # all subset sizes occur


class TestMaskFormer:
    def test_eval_forward_shapes(self, model_and_params):
        model, params = model_and_params
        x = batch(3)
        out = model.apply({"params": params}, x)
        assert out["pred_logits"].shape == (2, 10, 4)  # K+1 classes
        assert out["pred_masks"].shape == (2, 10, 16, 16)  # res2 = stride 4
        assert len(out["aux_outputs"]) == 3  # dec_layers
        assert np.isfinite(np.asarray(out["pred_masks"])).all()

    def test_train_forward_with_incomplete_modalities(self, model_and_params):
        model, params = model_and_params
        x = batch(4)
        present = masking.sample_modality_subset(jax.random.PRNGKey(7), 3)
        e = CFG.max_encoded_tokens
        mi = masking.incomplete_random_masks(
            jax.random.PRNGKey(8), DOMAINS, (NP_,) * 3, present, e, 2
        )
        out = model.apply(
            {"params": params}, x, mask_info=mi, present=present,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(9)},
        )
        assert np.isfinite(np.asarray(out["pred_logits"])).all()

    @pytest.mark.slow
    def test_no_recompile_across_subsets(self, model_and_params):
        model, params = model_and_params
        x = batch(5)
        e = CFG.max_encoded_tokens

        fwd = jax.jit(
            lambda p, x, mi, pres: model.apply(
                {"params": p}, x, mask_info=mi, present=pres
            )
        )
        for seed in range(3):
            present = masking.sample_modality_subset(jax.random.PRNGKey(seed), 3)
            mi = masking.incomplete_random_masks(
                jax.random.PRNGKey(seed + 10), DOMAINS, (NP_,) * 3, present, e, 2
            )
            fwd(params, x, mi, present)
        assert fwd._cache_size() == 1
