"""Smoke of the semantic E2E harness (tools/train_semantic_synthetic.py):
the dense-mask semantic criterion + 1-based label convention + ConfMatrix
eval pipeline runs and the loss decreases. The decisive full-config numbers
live in DOWNSTREAM_SEMANTIC_E2E.json (TPU run)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.train_semantic_synthetic import DOMAINS, K, make_batch


@pytest.mark.slow
def test_semantic_pipeline_learns():
    from incomplete_multimodal_fusion_tpu.eval.metrics import ConfMatrix
    from incomplete_multimodal_fusion_tpu.losses.set_criterion import SegTargets
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel)
    from incomplete_multimodal_fusion_tpu.train import downstream as ds

    cfg = MaskFormerConfig(
        num_classes=K + 1, image_size=64, dim_tokens=32, depth=2, dim_head=8,
        heads=2, num_fusion_tokens=16, conv_dim=32, mask_dim=32,
        transformer_enc_layers=1, num_queries=8, dec_layers=2,
        dim_feedforward=64, frozen_stages=0)
    model = MaskFormerModel(cfg)
    rng = np.random.default_rng(0)
    bn, masks, tlabels, valid, label = make_batch(rng, 2, 64)
    assert tlabels.min() == 1 and tlabels.max() == K  # 1-based convention
    batch = {d: jnp.asarray(bn[d]) for d in DOMAINS}
    targets = SegTargets(jnp.asarray(tlabels), jnp.asarray(masks),
                         jnp.asarray(valid))

    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx = ds.create_downstream_optimizer(params, lr=3e-4, clip_grad=0.01,
                                        frozen_stages=0)
    state = ds.DownstreamState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=tx.init(params),
                               rng=jax.random.PRNGKey(1))
    step = jax.jit(ds.make_downstream_train_step(
        model, cfg, tx, dense_masks=True, match_mode="greedy",
        compute_dtype="float32"), donate_argnums=0)
    losses = []
    for _ in range(30):
        state, m = step(state, batch, targets)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0] * 0.7

    pred_step = jax.jit(ds.make_semantic_pred_step(model, cfg))
    pred = np.asarray(pred_step(state.params, batch))
    assert pred.shape == label.shape
    assert pred.min() >= 1 and pred.max() <= K + 1  # 1-based, void allowed
    cm = ConfMatrix(K + 2)
    cm.add(label, pred)
    assert np.isfinite(cm.get_aa())
