"""Model-family variants: quadruplet (4-modality + semseg dnw), LSTM fusion,
supervised baseline, 2-modality s2+dem (reference pretrain_mmae_my.py,
multimae_lstm.py, multimae_sup.py, pretrain_mmae_s2dsm.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.config import (
    DataConfig, DecoderConfig, MaskConfig, ModelConfig, OptimConfig,
    PretrainConfig, TrainConfig,
)
from incomplete_multimodal_fusion_tpu.models.maskformer import (
    MaskFormerConfig, MaskFormerModel,
)
from incomplete_multimodal_fusion_tpu.models.multimae import MultiMAE
from incomplete_multimodal_fusion_tpu.ops import masking
from incomplete_multimodal_fusion_tpu.train import pretrain

IMG, PATCH, NP_ = 64, 16, 16


def quad_batch(seed, b=2):
    r = np.random.default_rng(seed)
    return {
        "s1_2ch": jnp.asarray(r.standard_normal((b, IMG, IMG, 2)), jnp.float32),
        "s2_4ch": jnp.asarray(r.standard_normal((b, IMG, IMG, 4)), jnp.float32),
        "dem": jnp.asarray(r.standard_normal((b, IMG, IMG, 1)), jnp.float32),
        "dnw": jnp.asarray(r.integers(0, 9, (b, IMG, IMG)), jnp.int32),
    }


QUAD = ("s1_2ch", "s2_4ch", "dem", "dnw")


class TestQuadruplet:
    @pytest.mark.slow
    def test_forward_shapes(self):
        model = MultiMAE(in_domains=QUAD, out_domains=QUAD, image_size=IMG,
                         patch_size=PATCH, dim_tokens=32, depth=2, dim_head=8,
                         heads=2, ff_mult=2, num_fusion_tokens=NP_,
                         decoder_dim=32, decoder_depth=1, decoder_num_heads=2)
        x = quad_batch(0)
        e = 32
        mi = masking.generate_random_masks(
            jax.random.PRNGKey(0), QUAD, (NP_,) * 4, e, 2
        )
        params = model.init(jax.random.PRNGKey(1), x, mi, e)["params"]
        out = model.apply({"params": params}, x, mi, e)
        assert out["preds"]["dnw"].shape == (2, IMG, IMG, 9)  # class logits
        assert out["preds"]["s2_4ch"].shape == (2, IMG, IMG, 4)
        assert out["pooled"].shape == (2, 5, 32)  # 4 modalities + fusion
        assert model.fusion_type == 4  # zorro_utils_quadruplet.py:18-23

    @pytest.mark.slow
    def test_quadruplet_train_step(self):
        cfg = PretrainConfig(
            model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2,
                              ff_mult=2, num_fusion_tokens=NP_),
            data=DataConfig(input_size=IMG, patch_size=PATCH, batch_size=2,
                            in_domains=QUAD, out_domains=QUAD),
            mask=MaskConfig(num_encoded_tokens=32),
            decoder=DecoderConfig(dim=32, depth=1, num_heads=2),
            train=TrainConfig(compute_dtype="float32"),
        )
        model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(0), 20)
        step = jax.jit(pretrain.make_train_step(model, cfg, tx))
        batch = quad_batch(1)
        losses = []
        for _ in range(6):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert "dnw_loss" in m and np.isfinite(float(m["dnw_loss"]))
        assert losses[-1] < losses[0]


class TestLSTMFusion:
    def make(self):
        return MultiMAE(in_domains=("s2", "dem"), out_domains=("s2", "dem"),
                        image_size=IMG, patch_size=PATCH, dim_tokens=32, depth=2,
                        dim_head=8, heads=2, ff_mult=2, num_fusion_tokens=NP_,
                        fusion_mode="lstm", decoder_dim=32, decoder_depth=1,
                        decoder_num_heads=2)

    def batch(self, seed, b=2):
        r = np.random.default_rng(seed)
        return {
            "s2": jnp.asarray(r.standard_normal((b, IMG, IMG, 3)), jnp.float32),
            "dem": jnp.asarray(r.standard_normal((b, IMG, IMG, 1)), jnp.float32),
        }

    @pytest.mark.slow
    def test_forward(self):
        """s2+dem LSTM model (pretrain_mmae_s2dsm.py uses multimae_lstm_s2dsm)."""
        model = self.make()
        x = self.batch(0)
        e = 24
        mi = masking.generate_random_masks(
            jax.random.PRNGKey(0), ("s2", "dem"), (NP_,) * 2, e, 2
        )
        params = model.init(jax.random.PRNGKey(1), x, mi, e)["params"]
        assert "attn_lstm" in params and not any(
            k.startswith("fus_block") for k in params
        )
        out = model.apply({"params": params}, x, mi, e)
        assert out["preds"]["s2"].shape == (2, IMG, IMG, 3)
        assert out["fusion_tokens"].shape == (2, NP_, 32)
        assert np.isfinite(np.asarray(out["preds"]["dem"])).all()

    def test_dropout_invariance(self):
        model = self.make()
        masks = {
            "s2": jnp.zeros((2, NP_), jnp.int32),
            "dem": jnp.ones((2, NP_), jnp.int32),  # dem dropped
        }
        mi = masking.mask_info_from_task_masks(masks, ("s2", "dem"), 24)
        xa = self.batch(1)
        params = model.init(jax.random.PRNGKey(2), xa, mi, 24)["params"]
        xb = dict(xa, dem=xa["dem"] * 17.0)
        oa = model.apply({"params": params}, xa, mi, 24)
        ob = model.apply({"params": params}, xb, mi, 24)
        np.testing.assert_allclose(
            np.asarray(oa["preds"]["s2"]), np.asarray(ob["preds"]["s2"]), atol=1e-5
        )

    @pytest.mark.slow
    def test_lstm_grads(self):
        model = self.make()
        x = self.batch(2)
        mi = masking.generate_random_masks(
            jax.random.PRNGKey(3), ("s2", "dem"), (NP_,) * 2, 24, 2
        )
        params = model.init(jax.random.PRNGKey(4), x, mi, 24)["params"]

        def loss(p):
            out = model.apply({"params": p}, x, mi, 24)
            return jnp.mean(out["preds"]["s2"] ** 2)

        g = jax.grad(loss)(params)
        gl = jnp.concatenate([v.reshape(-1) for v in jax.tree.leaves(g["attn_lstm"])])
        assert float(jnp.abs(gl).sum()) > 0  # lstm params receive gradient


class TestSupBaseline:
    def test_maskformer_sup_backbone(self):
        cfg = MaskFormerConfig(
            in_domains=("s1", "s2", "dem"), image_size=IMG, patch_size=PATCH,
            num_classes=2, dim_tokens=32, depth=2, dim_head=8, heads=2,
            num_fusion_tokens=NP_, conv_dim=32, mask_dim=32,
            transformer_enc_layers=1, num_queries=8, dec_layers=3,
            dim_feedforward=64, fusion_mode="sup",
        )
        model = MaskFormerModel(cfg)
        r = np.random.default_rng(0)
        x = {
            "s1": jnp.asarray(r.standard_normal((2, IMG, IMG, 1)), jnp.float32),
            "s2": jnp.asarray(r.standard_normal((2, IMG, IMG, 3)), jnp.float32),
            "dem": jnp.asarray(r.standard_normal((2, IMG, IMG, 1)), jnp.float32),
        }
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        assert "return_tokens" in params["backbone"]
        assert "fusion_tokens" not in params["backbone"]
        out = model.apply({"params": params}, x)
        assert out["pred_logits"].shape == (2, 8, 3)
        assert np.isfinite(np.asarray(out["pred_masks"])).all()


class TestCrossattnV1:
    """fusion_mode='crossattn_v1': the 20231203 dev snapshot
    (multimae_crossattn_20231203.py) — gathered fusion stream, per-layer
    cross-attention over mask-embedded modality grids, per-modality pools."""

    def _model(self, domains=("s1", "s2", "dem")):
        from incomplete_multimodal_fusion_tpu.config import (
            DataConfig, DecoderConfig, MaskConfig, ModelConfig, PretrainConfig,
        )
        from incomplete_multimodal_fusion_tpu.models.multimae import build_multimae

        cfg = PretrainConfig(
            model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2,
                              ff_mult=2, num_fusion_tokens=16,
                              fusion_mode="crossattn_v1"),
            data=DataConfig(input_size=64, batch_size=2, in_domains=domains,
                            out_domains=domains),
            mask=MaskConfig(num_encoded_tokens=24),
            decoder=DecoderConfig(dim=32, depth=1, num_heads=2),
        )
        return cfg, build_multimae(cfg)

    def _batch(self, seed=0):
        rng = np.random.default_rng(seed)
        return {d: jnp.asarray(rng.standard_normal((2, 64, 64, c)), jnp.float32)
                for d, c in (("s1", 1), ("s2", 3), ("dem", 1))}

    def test_forward_and_params(self):
        from incomplete_multimodal_fusion_tpu.ops import masking

        cfg, m = self._model()
        x = self._batch()
        mi = masking.generate_random_masks(
            jax.random.PRNGKey(0), ("s1", "s2", "dem"), (16,) * 3, 24, 2)
        params = m.init(jax.random.PRNGKey(0), x, mi, 24)["params"]
        # snapshot-specific modules: shared cross-attn + per-modality pools
        # (multimae_crossattn_20231203.py:106-118)
        for k in ("attn_pool_modalities", "mlp_modalities",
                  "attn_s1", "mlp_s1", "attn_dem", "mlp_dem"):
            assert k in params, k
        out = m.apply({"params": params}, x, mi, 24)
        for d in ("s1", "s2", "dem"):
            assert np.isfinite(np.asarray(out["preds"][d])).all()
            assert d in out["pooled_mod"]

    def test_dropped_modality_invariance(self):
        """The headline capability must hold for this variant too."""
        from incomplete_multimodal_fusion_tpu.ops import masking

        cfg, m = self._model()
        x = self._batch(1)
        doms = ("s1", "s2", "dem")
        tm = {d: jnp.full((2, 16), 1 if d == "s2" else 0, jnp.int32) for d in doms}
        mi = masking.mask_info_from_task_masks(tm, doms, 48)
        params = m.init(jax.random.PRNGKey(1), x, mi, 48)["params"]
        o1 = m.apply({"params": params}, x, mi, 48)
        x2 = dict(x); x2["s2"] = x["s2"] + 50.0
        o2 = m.apply({"params": params}, x2, mi, 48)
        for d in doms:
            np.testing.assert_allclose(np.asarray(o1["preds"][d]),
                                       np.asarray(o2["preds"][d]), atol=1e-5)

    def test_new_modules_receive_gradient(self):
        from incomplete_multimodal_fusion_tpu.ops import masking

        cfg, m = self._model()
        x = self._batch(2)
        mi = masking.generate_random_masks(
            jax.random.PRNGKey(2), ("s1", "s2", "dem"), (16,) * 3, 24, 2)
        params = m.init(jax.random.PRNGKey(2), x, mi, 24)["params"]

        def loss(p):
            out = m.apply({"params": p}, x, mi, 24)
            return sum(jnp.sum(jnp.square(v)) for v in out["preds"].values()) \
                + jnp.sum(jnp.square(out["pooled_mod"]["s1"]))

        g = jax.grad(loss)(params)
        for k in ("attn_pool_modalities", "mlp_modalities", "attn_s1"):
            total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g[k]))
            assert total > 0, f"{k} got no gradient"
