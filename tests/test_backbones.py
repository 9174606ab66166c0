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

    @pytest.mark.slow
    def test_priors_change_encoder_activations(self):
        """Interleaving criterion (VERDICT.md #7): with nonzero injector
        gamma, perturbing ONLY the SpatialPriorModule weights must change the
        encoder's internal block outputs — the priors are injected INTO the
        ViT computation (multimae_big_adapter.py:311-314), not merely summed
        onto its pyramid. With gamma=0 the same perturbation must leave the
        encoder untouched (negative control)."""
        import flax
        import jax.numpy as jnp

        from incomplete_multimodal_fusion_tpu.models.vit_baseline import ViTBaseline
        from incomplete_multimodal_fusion_tpu.ops import masking

        model = ViTBaseline(
            image_size=64, dim_tokens=32, depth=4, dim_head=8, heads=2,
            num_fusion_tokens=16, adapter=True,
        )
        x = batch()
        np_ = 16
        mi = masking.full_visible_mask_info(("s1", "s2", "dem"), (np_,) * 3, 2)
        params = model.init(jax.random.PRNGKey(0), x, mi, 3 * np_)["params"]

        def with_gamma(p, val):
            p = flax.core.unfreeze(p)
            out = flax.traverse_util.flatten_dict(p)
            for k in list(out):
                if k[-1] == "gamma" and any(s.startswith("injector") for s in k):
                    out[k] = jnp.full_like(out[k], val)
            return flax.traverse_util.unflatten_dict(out)

        def perturb_spm(p):
            out = flax.traverse_util.flatten_dict(flax.core.unfreeze(p))
            for k in list(out):
                if k[0] == "spm" and k[-1] == "kernel":
                    out[k] = out[k] + 0.5
            return flax.traverse_util.unflatten_dict(out)

        def block_out(p):
            _, inter = model.apply(
                {"params": p}, x, mi, 3 * np_,
                capture_intermediates=lambda mdl, name: mdl.name == "block3",
            )
            return np.asarray(
                jax.tree.leaves(inter["intermediates"])[0]
            )

        p_on = with_gamma(params, 1.0)
        assert not np.allclose(block_out(p_on), block_out(perturb_spm(p_on)),
                               atol=1e-6), "priors do not reach the encoder"
        p_off = with_gamma(params, 0.0)
        np.testing.assert_allclose(block_out(p_off), block_out(perturb_spm(p_off)),
                                   atol=1e-6)

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
