"""Patch-space loss variants must match the pixel-space originals.

The patch variants (losses/masked.py PATCH_LOSS_FNS) are a TPU layout
optimization: same math as the pixel functions on the decoder's native
[B, N, p*p*C] layout. Equivalence here is up to float reassociation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.losses.masked import (
    masked_mse_loss, masked_l1_loss, masked_cross_entropy_loss,
    masked_mse_loss_patch, masked_l1_loss_patch, masked_cross_entropy_loss_patch,
)
from incomplete_multimodal_fusion_tpu.ops.patches import unpatchify


P = 8
NH = 4
B, C, K = 3, 2, 5


def _mk(rng, norm_pix):
    pred_patch = jnp.asarray(rng.normal(size=(B, NH * NH, P * P * C)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(B, NH * P, NH * P, C)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, NH * NH)), jnp.int32)
    return pred_patch, target, mask


@pytest.mark.parametrize("norm_pix", [False, True])
@pytest.mark.parametrize("pair", [
    (masked_mse_loss, masked_mse_loss_patch),
    (masked_l1_loss, masked_l1_loss_patch),
])
def test_patch_matches_pixel(pair, norm_pix):
    pixel_fn, patch_fn = pair
    rng = np.random.default_rng(0)
    pred_patch, target, mask = _mk(rng, norm_pix)
    pred_pixel = unpatchify(pred_patch, P, NH, NH, C)
    a = pixel_fn(pred_pixel, target, mask, patch_size=P, norm_pix=norm_pix)
    b = patch_fn(pred_patch, target, mask, patch_size=P, norm_pix=norm_pix)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # mask=None branch
    a0 = pixel_fn(pred_pixel, target, None, patch_size=P, norm_pix=norm_pix)
    b0 = patch_fn(pred_patch, target, None, patch_size=P, norm_pix=norm_pix)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(b0), rtol=1e-5, atol=1e-6)


def test_patch_matches_pixel_zero_mask():
    rng = np.random.default_rng(1)
    pred_patch, target, _ = _mk(rng, False)
    mask = jnp.zeros((B, NH * NH), jnp.int32)
    pred_pixel = unpatchify(pred_patch, P, NH, NH, C)
    a = masked_mse_loss(pred_pixel, target, mask, patch_size=P)
    b = masked_mse_loss_patch(pred_patch, target, mask, patch_size=P)
    assert float(a) == float(b) == 0.0


def test_patch_ce_matches_pixel():
    rng = np.random.default_rng(2)
    logits_patch = jnp.asarray(rng.normal(size=(B, NH * NH, P * P * K)), jnp.float32)
    target = jnp.asarray(rng.integers(0, K, size=(B, NH * P, NH * P)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, NH * NH)), jnp.int32)
    logits_pixel = unpatchify(logits_patch, P, NH, NH, K)
    for m in (mask, None):
        a = masked_cross_entropy_loss(logits_pixel, target, m, patch_size=P)
        b = masked_cross_entropy_loss_patch(logits_patch, target, m, patch_size=P)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_model_exposes_patch_preds():
    """preds_patch must be the exact patch layout of preds (all fusion modes
    keep them consistent)."""
    import jax
    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig, ModelConfig,
    )
    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
    from incomplete_multimodal_fusion_tpu.train import pretrain
    from incomplete_multimodal_fusion_tpu.ops.masking import generate_random_masks

    cfg = PretrainConfig(
        data=DataConfig(input_size=64, patch_size=16, in_domains=("s1", "s2"),
                        out_domains=("s1", "s2"), batch_size=2),
        mask=MaskConfig(num_encoded_tokens=24),
        model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2,
                          ff_mult=2, num_fusion_tokens=16),
    )
    model, state, _ = pretrain.create_train_state(
        cfg, jax.random.PRNGKey(0), total_steps=10)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        np.random.default_rng(0), cfg.data.in_domains, 2, 64).items()}
    n_tok = (64 // 16) ** 2
    mi = generate_random_masks(
        jax.random.PRNGKey(1), cfg.data.in_domains, (n_tok, n_tok),
        cfg.mask.num_encoded_tokens, 2)
    out = model.apply({"params": state.params}, batch, mi,
                      cfg.mask.num_encoded_tokens, deterministic=True)
    assert set(out["preds_patch"]) == set(out["preds"])
    for d, x in out["preds_patch"].items():
        img = out["preds"][d]
        c = img.shape[-1]
        nh = img.shape[1] // 16
        np.testing.assert_allclose(
            np.asarray(unpatchify(x, 16, nh, nh, c)), np.asarray(img),
            rtol=1e-6, atol=1e-6)
