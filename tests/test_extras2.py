"""Full output adapter, layerwise LR decay, TTA, summary writer, activation
stats."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.multimae import MultiMAE
from incomplete_multimodal_fusion_tpu.ops import masking
from tests.test_model import CH, DOMAINS, IMG, NP_, batch


class TestFullOutputAdapter:
    def make(self):
        return MultiMAE(in_domains=DOMAINS, out_domains=DOMAINS, image_size=IMG,
                        patch_size=16, dim_tokens=32, depth=2, dim_head=8, heads=2,
                        ff_mult=2, num_fusion_tokens=NP_, decoder_dim=32,
                        decoder_depth=1, decoder_num_heads=2, decoder_style="full")

    @pytest.mark.slow
    def test_forward_shapes(self):
        model = self.make()
        x = batch(0)
        e = 24
        mi = masking.generate_random_masks(jax.random.PRNGKey(0), DOMAINS, (NP_,) * 3, e, 2)
        params = model.init(jax.random.PRNGKey(1), x, mi, e)["params"]
        assert "mask_token" in params["output_adapter_s2"]
        assert "task_emb_dem" in params["output_adapter_s2"]  # context embs for all tasks
        out = model.apply({"params": params}, x, mi, e)
        for d in DOMAINS:
            assert out["preds"][d].shape == (2, IMG, IMG, CH[d])
            assert np.isfinite(np.asarray(out["preds"][d])).all()

    def test_dropped_modality_invariance_full_decoder(self):
        model = self.make()
        masks = {
            "s1": jnp.zeros((2, NP_), jnp.int32),
            "s2": jnp.ones((2, NP_), jnp.int32),
            "dem": jnp.zeros((2, NP_), jnp.int32),
        }
        mi = masking.mask_info_from_task_masks(masks, DOMAINS, 32)
        xa = batch(1)
        params = model.init(jax.random.PRNGKey(2), xa, mi, 32)["params"]
        xb = dict(xa, s2=xa["s2"] * 5.0 + 1.0)
        oa = model.apply({"params": params}, xa, mi, 32)
        ob = model.apply({"params": params}, xb, mi, 32)
        np.testing.assert_allclose(
            np.asarray(oa["preds"]["s1"]), np.asarray(ob["preds"]["s1"]), atol=1e-5
        )


class TestLayerDecay:
    def test_scales(self):
        from incomplete_multimodal_fusion_tpu.train.optim import layer_decay_scales

        params = {
            "input_adapter_s1": {"k": jnp.zeros((2, 2))},
            "block0": {"k": jnp.zeros((2, 2))},
            "block11": {"k": jnp.zeros((2, 2))},
            "norm": {"gamma": jnp.zeros((2,))},
        }
        s = layer_decay_scales(params, num_layers=12, decay=0.5)
        assert s["input_adapter_s1"]["k"] == pytest.approx(0.5 ** 13)
        assert s["block0"]["k"] == pytest.approx(0.5 ** 12)
        assert s["block11"]["k"] == pytest.approx(0.5 ** 1)
        assert s["norm"]["gamma"] == pytest.approx(1.0)

    def test_optimizer_with_layer_decay_runs(self):
        import optax

        from incomplete_multimodal_fusion_tpu.train.optim import create_optimizer

        params = {"block0": {"k": jnp.ones((4, 4))}, "norm": {"gamma": jnp.ones((4,))}}
        tx = create_optimizer(params, lambda s: 0.1, lambda s: 0.0,
                              layer_decay=0.5, num_layers=2)
        st = tx.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        up, _ = tx.update(g, st, params)
        # block0 update scaled by 0.5**2 relative to head
        r = abs(float(up["block0"]["k"][0, 0])) / abs(float(up["norm"]["gamma"][0]))
        assert r == pytest.approx(0.25, rel=1e-3)


class TestTTA:
    def test_flip_tta_vit(self):
        from incomplete_multimodal_fusion_tpu import infer_segmentation as infseg
        from tests.test_downstream_model import CFG, batch as dbatch
        from incomplete_multimodal_fusion_tpu.models.maskformer import MaskFormerModel

        model = MaskFormerModel(CFG)
        x = dbatch(0)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        sem = infseg.semantic_inference_with_tta(model, params, x)
        assert sem.shape == (2, CFG.num_classes, 64, 64)
        assert np.isfinite(np.asarray(sem)).all()


class TestUtils:
    @pytest.mark.slow
    def test_summary_writer(self, tmp_path):
        from incomplete_multimodal_fusion_tpu.utils.summary import create_summary

        w = create_summary(str(tmp_path))
        w.add_scalar("loss", 1.5, 0)
        w.add_scalars({"a": 1.0, "b": 2.0}, 1)
        w.close()
        import json

        lines = [json.loads(l) for l in open(w.path)]
        assert lines[0]["tag"] == "loss" and lines[0]["value"] == 1.5
        assert len(lines) == 3

    def test_activation_stats(self):
        from incomplete_multimodal_fusion_tpu.utils.activation_stats import (
            collect_activation_stats,
        )
        from incomplete_multimodal_fusion_tpu.models.layers import Mlp

        m = Mlp(hidden_features=8)
        x = jnp.ones((2, 4))
        v = m.init(jax.random.PRNGKey(0), x)
        stats = collect_activation_stats(m, v, x, filter_regex="fc1")
        assert any("fc1" in k for k in stats)
        for s in stats.values():
            assert set(s) == {"mean", "std", "absmax"}


def test_wandb_logger_fallback(tmp_path):
    """WandbLogger (logger.py:170-198 equivalent) writes a local jsonl when
    wandb is unavailable."""
    import json as _json

    from incomplete_multimodal_fusion_tpu.utils.logging import WandbLogger

    wl = WandbLogger(config={"a": 1}, out_dir=str(tmp_path))
    wl.set_step(5)
    wl.update({"loss": 1.5, "skip": None})
    wl.set_step()
    wl.update({"loss": 1.25})
    lines = [_json.loads(l) for l in
             open(tmp_path / "wandb_fallback.jsonl").read().splitlines()]
    assert lines[0] == {"step": 5, "loss": 1.5}
    assert lines[1] == {"step": 6, "loss": 1.25}
