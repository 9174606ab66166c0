"""Golden-value parity vs the PyTorch reference (VERDICT.md Missing #5).

`tests/golden/reference_golden.npz` holds inputs/weights/outputs frozen from
the reference implementation itself (see tests/golden/generate_reference_golden.py
for exactly which reference files were executed). These tests assert the JAX
framework reproduces the reference numerics to fp32 tolerance — no torch at
runtime.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

G = dict(
    np.load(
        os.path.join(os.path.dirname(__file__), "golden", "reference_golden.npz")
    )
)


def k(w):  # torch Linear weight [out, in] -> flax Dense kernel [in, out]
    return jnp.asarray(w.T)


# ---------------------------------------------------------------- posemb
@pytest.mark.parametrize("h,w,d", [(4, 4, 32), (16, 16, 192)])
def test_sincos_posemb(h, w, d):
    from incomplete_multimodal_fusion_tpu.ops.posemb import build_2d_sincos_posemb

    mine = np.asarray(build_2d_sincos_posemb(h, w, d))  # [h*w, d], '(h w)' order
    ref = G[f"posemb_{h}x{w}x{d}"][0]  # [d, h, w]
    np.testing.assert_allclose(
        mine.reshape(h, w, d).transpose(2, 0, 1), ref, atol=1e-5
    )


# ---------------------------------------------------------------- masked losses
def _nhwc(x):  # golden is NCHW
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def test_masked_mse():
    from incomplete_multimodal_fusion_tpu.losses.masked import masked_mse_loss

    mask = jnp.asarray(G["loss_mask"])
    got = masked_mse_loss(_nhwc(G["mse_pred"]), _nhwc(G["mse_tgt"]), mask, patch_size=8)
    np.testing.assert_allclose(float(got), G["mse_masked"], rtol=1e-5)
    got = masked_mse_loss(_nhwc(G["mse_pred"]), _nhwc(G["mse_tgt"]), patch_size=8)
    np.testing.assert_allclose(float(got), G["mse_unmasked"], rtol=1e-5)
    got = masked_mse_loss(
        _nhwc(G["mse_pred"]), _nhwc(G["mse_tgt"]), mask, patch_size=8, norm_pix=True
    )
    np.testing.assert_allclose(float(got), G["mse_normpix"], rtol=1e-5)
    got = masked_mse_loss(
        _nhwc(G["mse_pred"]), _nhwc(G["mse_tgt"]), jnp.zeros_like(mask), patch_size=8
    )
    np.testing.assert_allclose(float(got), G["mse_zero_mask"], atol=0)


def test_masked_l1():
    from incomplete_multimodal_fusion_tpu.losses.masked import masked_l1_loss

    got = masked_l1_loss(
        _nhwc(G["l1_pred"]), _nhwc(G["l1_tgt"]), jnp.asarray(G["loss_mask"]), patch_size=8
    )
    np.testing.assert_allclose(float(got), G["l1_masked"], rtol=1e-5)


def test_masked_ce():
    from incomplete_multimodal_fusion_tpu.losses.masked import masked_cross_entropy_loss

    logits = _nhwc(G["ce_logits"])
    target = jnp.asarray(G["ce_target"])
    mask = jnp.asarray(G["loss_mask"])
    got = masked_cross_entropy_loss(logits, target, mask, patch_size=8)
    np.testing.assert_allclose(float(got), G["ce_masked"], rtol=1e-5)
    got = masked_cross_entropy_loss(
        logits, target, mask, patch_size=8, label_smoothing=0.1
    )
    np.testing.assert_allclose(float(got), G["ce_smoothed"], rtol=1e-5)


# ---------------------------------------------------------------- contrastive
def test_contrastive_losses():
    from incomplete_multimodal_fusion_tpu.losses import contrastive as C

    za, zb = jnp.asarray(G["contra_a"]), jnp.asarray(G["contra_b"])
    np.testing.assert_allclose(float(C.vicreg_loss(za, zb)), G["vicreg"], rtol=1e-4)
    np.testing.assert_allclose(
        float(C.hard_negative_loss(za, zb)), G["hardneg_hard"], rtol=1e-5
    )
    np.testing.assert_allclose(
        float(C.hard_negative_loss(za, zb, estimator="easy")),
        G["hardneg_easy"], rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(C.byol_loss(za, zb, simplified=True)), G["byol_simple"], rtol=1e-5
    )
    np.testing.assert_allclose(
        float(C.byol_loss(za, zb, simplified=False)), G["byol_full"], rtol=1e-5
    )
    np.testing.assert_allclose(float(C.dino_loss(za, zb)), G["dino_fn"], rtol=1e-5)


def test_dino_centered():
    from incomplete_multimodal_fusion_tpu.losses import contrastive as C

    za, zb = jnp.asarray(G["contra_a"]), jnp.asarray(G["contra_b"])
    rows = lambda x: [x[i : i + 1] for i in range(x.shape[0])]
    state = C.init_dino_center(za.shape[1])
    loss1, state = C.dino_center_loss(state, rows(za), rows(zb))
    np.testing.assert_allclose(float(loss1), G["dinoc_loss1"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.center), G["dinoc_center1"], atol=1e-6)
    loss2, state = C.dino_center_loss(state, rows(zb), rows(za))
    np.testing.assert_allclose(float(loss2), G["dinoc_loss2"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.center), G["dinoc_center2"], atol=1e-6)


# ------------------------------------------------- Block / Block_Fusion
def _ln(prefix):
    return {"gamma": jnp.asarray(G[f"{prefix}.gamma"])}


def test_encoder_block_matches_reference():
    """Zorro-masked encoder Block forward, weights transplanted from the
    torch reference (downstream zorro_utils.py:227-240)."""
    from incomplete_multimodal_fusion_tpu.models.layers import EncoderBlock

    W = {kk.split("::", 1)[1]: v for kk, v in G.items() if kk.startswith("block_w::")}
    params = {
        "norm1": {"gamma": jnp.asarray(W["norm1.gamma"])},
        "attn": {
            "norm": {"gamma": jnp.asarray(W["attn.norm.gamma"])},
            "to_q": {"kernel": k(W["attn.to_q.weight"])},
            "to_kv": {"kernel": k(W["attn.to_kv.weight"])},
            "to_out": {"kernel": k(W["attn.to_out.weight"])},
        },
        "norm2": {"gamma": jnp.asarray(W["norm2.gamma"])},
        "mlp": {
            "norm": {"gamma": jnp.asarray(W["mlp.0.gamma"])},
            "proj_in": {"kernel": k(W["mlp.1.weight"])},
            "proj_out": {"kernel": k(W["mlp.3.weight"])},
        },
    }
    types = G["block_types"]
    zmask = (types[:, None] == types[None, :]) | (types[:, None] == 3)
    blk = EncoderBlock(dim_head=8, heads=2, ff_mult=4)
    out = blk.apply(
        {"params": params},
        jnp.asarray(G["block_x"]),
        attn_mask=jnp.asarray(zmask)[None, None],
    )
    np.testing.assert_allclose(np.asarray(out), G["block_out"], atol=2e-5)


def test_fusion_block_matches_reference():
    """Block_Fusion forward (downstream zorro_utils.py:243-258): the JAX
    FusionBlock computes the fusion-row query only — must be bitwise the same
    as the reference attending all rows then keeping row -1."""
    from incomplete_multimodal_fusion_tpu.models.layers import FusionBlock

    W = {kk.split("::", 1)[1]: v for kk, v in G.items() if kk.startswith("fusion_w::")}
    params = {
        "norm1": {"gamma": jnp.asarray(W["norm1.gamma"])},
        "attn_norm": {"gamma": jnp.asarray(W["attn.norm.gamma"])},
        "to_q": {"kernel": k(W["attn.to_q.weight"])},
        "to_kv": {"kernel": k(W["attn.to_kv.weight"])},
        "to_out": {"kernel": k(W["attn.to_out.weight"])},
        "norm2": {"gamma": jnp.asarray(W["norm2.gamma"])},
        "mlp": {
            "norm": {"gamma": jnp.asarray(W["mlp.0.gamma"])},
            "proj_in": {"kernel": k(W["mlp.1.weight"])},
            "proj_out": {"kernel": k(W["mlp.3.weight"])},
        },
    }
    blk = FusionBlock(dim_head=8, heads=2, ff_mult=4)
    out = blk.apply({"params": params}, jnp.asarray(G["fusion_x"]))
    np.testing.assert_allclose(np.asarray(out), G["fusion_out"], atol=2e-5)
