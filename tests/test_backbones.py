"""Swin and ViT-Adapter backbone variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.maskformer import (
    MaskFormerConfig, MaskFormerModel,
)
from incomplete_multimodal_fusion_tpu.models.swin import SwinTransformer


def batch(seed=0, b=2, img=64):
    r = np.random.default_rng(seed)
    return {
        "s1": jnp.asarray(r.standard_normal((b, img, img, 1)), jnp.float32),
        "s2": jnp.asarray(r.standard_normal((b, img, img, 3)), jnp.float32),
        "dem": jnp.asarray(r.standard_normal((b, img, img, 1)), jnp.float32),
    }


class TestSwin:
    @pytest.mark.slow
    def test_pyramid(self):
        m = SwinTransformer()
        x = jnp.zeros((1, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        feats = m.apply(params, x)
        assert [f.shape for f in feats] == [
            (1, 16, 16, 96), (1, 8, 8, 192), (1, 4, 4, 384), (1, 2, 2, 768)
        ]

    def test_shifted_windows_change_output(self):
        """Shifted-window mask actually gates cross-window attention."""
        m = SwinTransformer(depths=(2,), num_heads=(3,), window=4)
        r = np.random.default_rng(0)
        x = jnp.asarray(r.standard_normal((1, 32, 32, 3)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        f = m.apply(params, x)[0]
        assert np.isfinite(np.asarray(f)).all()

    @pytest.mark.slow
    def test_maskformer_swin(self):
        cfg = MaskFormerConfig(
            image_size=64, num_classes=2, conv_dim=32, mask_dim=32,
            transformer_enc_layers=1, num_queries=8, dec_layers=3,
            dim_feedforward=64, backbone_type="swin",
        )
        model = MaskFormerModel(cfg)
        x = batch()
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out["pred_logits"].shape == (2, 8, 3)
        assert np.isfinite(np.asarray(out["pred_masks"])).all()


class TestViTAdapter:
    @pytest.mark.slow
    def test_maskformer_vit_adapter(self):
        cfg = MaskFormerConfig(
            image_size=64, num_classes=2, dim_tokens=32, depth=4, dim_head=8,
            heads=2, num_fusion_tokens=16, conv_dim=32, mask_dim=32,
            transformer_enc_layers=1, num_queries=8, dec_layers=3,
            dim_feedforward=64, backbone_type="vit_adapter",
        )
        model = MaskFormerModel(cfg)
        x = batch()
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        assert "spm" in params["backbone"]
        assert "injector0" in params["backbone"]
        out = model.apply({"params": params}, x)
        assert out["pred_logits"].shape == (2, 8, 3)
        assert np.isfinite(np.asarray(out["pred_masks"])).all()

    def test_adapter_injector_zero_init_keeps_vit(self):
        """gamma=0 init: at init the injector is an identity on tokens, so
        the model starts as the plain fusion ViT + prior pyramid."""
        from incomplete_multimodal_fusion_tpu.models.vit_adapter import Injector

        inj = Injector(16)
        r = np.random.default_rng(0)
        tokens = jnp.asarray(r.standard_normal((1, 8, 16)), jnp.float32)
        ref = jnp.full((1, 8, 1, 2), 0.5)
        priors = jnp.asarray(r.standard_normal((1, 4, 16)), jnp.float32)
        params = inj.init(jax.random.PRNGKey(0), tokens, ref, priors, [(2, 2)])
        out = inj.apply(params, tokens, ref, priors, [(2, 2)])
        np.testing.assert_allclose(np.asarray(out), np.asarray(tokens), atol=1e-6)
