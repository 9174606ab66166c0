"""Masked reconstruction losses (reference pretraining/multimae/criterion.py).

Semantics preserved exactly, including the quirky bits:
  * the patch-level mask is upsampled nearest to the pixel grid
    (criterion.py:104-106);
  * per-sample masked mean, then ``nanmean`` over the batch so zero-mask
    samples drop out (criterion.py:110-111);
  * all-zero masks return 0 (criterion.py:100-102).

Images are NHWC here (reference is NCHW).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp


def _upsample_mask_nearest(mask: jnp.ndarray, h: int, w: int, p: int) -> jnp.ndarray:
    """[B, nh*nw] patch mask -> [B, H, W] pixel mask (nearest)."""
    nh, nw = h // p, w // p
    m = mask.reshape(mask.shape[0], nh, nw).astype(jnp.float32)
    m = jnp.repeat(jnp.repeat(m, p, axis=1), p, axis=2)
    return m


def _masked_reduce(loss_phw: jnp.ndarray, mask: jnp.ndarray, p: int) -> jnp.ndarray:
    """loss_phw: [B, H, W] per-pixel loss; mask: [B, nh*nw] (1 = masked patch,
    loss is computed ON masked patches, MAE-style).

    The reference produces 0/0 -> nan for zero-mask samples and drops them
    with nanmean (criterion.py:110-111); we account valid samples explicitly
    — identical values, but no nan ever enters the graph (a nan inside
    ``where`` would still poison gradients under JAX autodiff).
    """
    b, h, w = loss_phw.shape
    pix_mask = _upsample_mask_nearest(mask, h, w, p)
    num = jnp.sum((loss_phw * pix_mask).reshape(b, -1), axis=1)
    den = jnp.sum(pix_mask.reshape(b, -1), axis=1)
    valid = den > 0
    per_sample = num / jnp.maximum(den, 1.0)
    total = jnp.sum(jnp.where(valid, per_sample, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.where(jnp.sum(mask) == 0, 0.0, total)


def _norm_pix(target: jnp.ndarray, p: int) -> jnp.ndarray:
    """Per-patch target normalization (criterion.py:90-96)."""
    b, h, w, c = target.shape
    nh, nw = h // p, w // p
    t = target.reshape(b, nh, p, nw, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, -1)
    mean = t.mean(axis=-1, keepdims=True)
    # torch .var() defaults to the unbiased (N-1) estimator (criterion.py:92)
    var = t.var(axis=-1, keepdims=True, ddof=1)
    t = (t - mean) / jnp.sqrt(var + 1e-6)
    t = t.reshape(b, nh, nw, p, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    return t


def masked_mse_loss(pred, target, mask: Optional[jnp.ndarray] = None, *, patch_size: int = 16,
                    stride: int = 1, norm_pix: bool = False):
    """MaskedMSELoss (criterion.py:61-115). pred/target [B, H, W, C]."""
    p = patch_size // stride
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if norm_pix:
        target = _norm_pix(target, p)
    loss = (pred - target) ** 2
    if mask is None:
        return loss.mean()
    return _masked_reduce(loss.mean(axis=-1), mask, p)


def masked_l1_loss(pred, target, mask: Optional[jnp.ndarray] = None, *, patch_size: int = 16,
                   stride: int = 1, norm_pix: bool = False):
    """MaskedL1Loss (criterion.py:118-172)."""
    p = patch_size // stride
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if norm_pix:
        target = _norm_pix(target, p)
    loss = jnp.abs(pred - target)
    if mask is None:
        return loss.mean()
    return _masked_reduce(loss.mean(axis=-1), mask, p)


def masked_cross_entropy_loss(logits, target, mask: Optional[jnp.ndarray] = None, *,
                              patch_size: int = 16, stride: int = 1,
                              label_smoothing: float = 0.0):
    """MaskedCrossEntropyLoss (criterion.py:24-58).

    logits [B, H, W, K], target [B, H, W] int.
    """
    p = patch_size // stride
    logits = logits.astype(jnp.float32)
    k = logits.shape[-1]
    logp = logits - jnp.max(logits, axis=-1, keepdims=True)
    logp = logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))
    onehot = jnp.eye(k, dtype=jnp.float32)[target]
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / k
    loss = -jnp.sum(onehot * logp, axis=-1)  # [B, H, W]
    if mask is None:
        return loss.mean()
    return _masked_reduce(loss, mask, p)


LOSS_FNS: Dict[str, Callable] = {
    "mse": masked_mse_loss,
    "l1": masked_l1_loss,
    "cross_entropy": masked_cross_entropy_loss,
}


# ---------------------------------------------------------------------------
# Patch-space variants (TPU layout optimization; same math as above).
#
# The pixel-space functions above force XLA into layout-transpose copies
# each step: the 6-D norm-pix transpose/transpose-back pair, the pred
# unpatchify, and a nearest-upsampled pixel mask. These variants consume the
# decoder's native patch layout ``pred_patch [B, N, p*p*C]`` (pixel order
# (ph, pw, c), criterion.py:75-78) directly: the target is patchified once,
# norm-pix normalizes over the last axis with no transpose-back, and the
# patch-level mask applies without pixel upsampling. Values are identical to
# the pixel-space functions up to float reassociation (see
# tests/test_losses.py patch-vs-pixel equivalence).
# ---------------------------------------------------------------------------

def _patchify_f32(target: jnp.ndarray, p: int) -> jnp.ndarray:
    from ..ops.patches import patchify  # the canonical (ph, pw, c) layout

    if target.ndim == 3:
        # already patch-major [B, N, p*p*C] (host-side patchify,
        # data.patchify_batch) — no device-side 6-D transpose
        return target.astype(jnp.float32)
    return patchify(target.astype(jnp.float32), p)


def _masked_reduce_patch(per_patch: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """per_patch: [B, N] per-patch MEAN loss; mask: [B, N] (1 = masked).

    Same per-sample-mean / nanmean-over-batch semantics as ``_masked_reduce``
    — within a patch every pixel shares the mask value, so the pixel-weighted
    mean collapses to a patch-weighted mean of per-patch means.
    """
    m = mask.astype(jnp.float32)
    num = jnp.sum(per_patch * m, axis=1)
    den = jnp.sum(m, axis=1)
    valid = den > 0
    per_sample = num / jnp.maximum(den, 1.0)
    total = jnp.sum(jnp.where(valid, per_sample, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.where(jnp.sum(mask) == 0, 0.0, total)


def _norm_pix_patch(t: jnp.ndarray) -> jnp.ndarray:
    """Per-patch normalization on [B, N, p*p*C] (criterion.py:90-96)."""
    mean = t.mean(axis=-1, keepdims=True)
    var = t.var(axis=-1, keepdims=True, ddof=1)
    return (t - mean) / jnp.sqrt(var + 1e-6)


def masked_mse_loss_patch(pred_patch, target, mask: Optional[jnp.ndarray] = None, *,
                          patch_size: int = 16, stride: int = 1,
                          norm_pix: bool = False):
    """MaskedMSELoss on patch-layout preds. pred_patch [B, N, p*p*C],
    target [B, H, W, C] pixels."""
    p = patch_size // stride
    pred = pred_patch.astype(jnp.float32)
    t = _patchify_f32(target, p)
    if norm_pix:
        t = _norm_pix_patch(t)
    loss = (pred - t) ** 2
    if mask is None:
        return loss.mean()
    return _masked_reduce_patch(loss.mean(axis=-1), mask)


def masked_l1_loss_patch(pred_patch, target, mask: Optional[jnp.ndarray] = None, *,
                         patch_size: int = 16, stride: int = 1,
                         norm_pix: bool = False):
    """MaskedL1Loss on patch-layout preds."""
    p = patch_size // stride
    pred = pred_patch.astype(jnp.float32)
    t = _patchify_f32(target, p)
    if norm_pix:
        t = _norm_pix_patch(t)
    loss = jnp.abs(pred - t)
    if mask is None:
        return loss.mean()
    return _masked_reduce_patch(loss.mean(axis=-1), mask)


def masked_cross_entropy_loss_patch(pred_patch, target, mask: Optional[jnp.ndarray] = None, *,
                                    patch_size: int = 16, stride: int = 1,
                                    label_smoothing: float = 0.0):
    """MaskedCrossEntropyLoss on patch-layout logits.

    pred_patch [B, N, p*p*K] (pixel order (ph, pw, k)), target [B, H, W] int.
    """
    p = patch_size // stride
    b, n, pk = pred_patch.shape
    k = pk // (p * p)
    logits = pred_patch.astype(jnp.float32).reshape(b, n, p * p, k)
    nh = int(n ** 0.5)
    t = target.reshape(b, nh, p, nh, p).transpose(0, 1, 3, 2, 4).reshape(b, n, p * p)
    logp = logits - jnp.max(logits, axis=-1, keepdims=True)
    logp = logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))
    onehot = jnp.eye(k, dtype=jnp.float32)[t]
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / k
    loss = -jnp.sum(onehot * logp, axis=-1)  # [B, N, p*p]
    if mask is None:
        return loss.mean()
    return _masked_reduce_patch(loss.mean(axis=-1), mask)


PATCH_LOSS_FNS: Dict[str, Callable] = {
    "mse": masked_mse_loss_patch,
    "l1": masked_l1_loss_patch,
    "cross_entropy": masked_cross_entropy_loss_patch,
}
