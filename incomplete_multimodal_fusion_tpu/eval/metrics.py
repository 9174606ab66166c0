"""Evaluation metrics and inference post-processing.

  * semantic_inference / instance_inference
    (reference maskformer_train_ins_vit.py:325-369)
  * dice score (:308-316)
  * ConfMatrix AA / SA / IoU / mIoU (semantic utils/metrics.py:7-100) —
    sklearn-free numpy implementation with identical semantics, including
    the ignore-class-0 filter in add().
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def semantic_inference(mask_cls: jnp.ndarray, mask_pred: jnp.ndarray) -> jnp.ndarray:
    """softmax(cls)[..., 1:] x sigmoid(mask) -> [B, num_classes, H, W]
    (maskformer_train_ins_vit.py:325-329 AND maskformer_train_seg.py:305 —
    both reference trainers drop softmax channel 0).

    Label convention this implies (and tools/train_semantic_synthetic.py
    follows): semantic GT labels are 1-BASED with 0 = ignore; the criterion
    receives the raw 1-based ids, so logits channel 0 is a dead class that
    never appears as a target and void sits at channel num_classes (last).
    Dropping channel 0 aligns kept-channel j with label j+1; the void channel
    survives in the kept set, so argmax can emit label num_classes+... = void
    (counted wrong against any GT — the reference has the same property).
    Feeding 0-BASED labels here silently misaligns every class by one."""
    cls = jax.nn.softmax(mask_cls, axis=-1)[..., 1:]
    m = jax.nn.sigmoid(mask_pred)
    return jnp.einsum("bqc,bqhw->bchw", cls, m)


def instance_inference(
    mask_cls: jnp.ndarray,  # [Q, K+1]
    mask_pred: jnp.ndarray,  # [Q, H, W] logits at full resolution
    num_classes: int,
    topk: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Top-k over Q*K scores + mask-probability rescoring
    (maskformer_train_ins_vit.py:331-369). Returns dict instead of a
    detectron2 Instances."""
    q = mask_cls.shape[0]
    scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]  # [Q, K]
    labels = jnp.tile(jnp.arange(num_classes), (q,))  # [Q*K]
    flat = scores.reshape(-1)
    topk = min(topk, flat.shape[0])
    scores_k, idx = jax.lax.top_k(flat, topk)
    labels_k = labels[idx]
    query_idx = idx // num_classes
    masks = mask_pred[query_idx]  # [topk, H, W]
    bin_masks = (masks > 0).astype(jnp.float32)
    mask_prob = jax.nn.sigmoid(masks)
    rescore = jnp.sum(mask_prob * bin_masks, axis=(1, 2)) / (
        jnp.sum(bin_masks, axis=(1, 2)) + 1e-6
    )
    return {
        "scores": scores_k * rescore,
        "pred_classes": labels_k,
        "pred_masks": bin_masks,
        "mask_logits": masks,
    }


def dice_score(predict: jnp.ndarray, target: jnp.ndarray, smooth: float = 1e-5):
    """Per-class dice, meaned (maskformer_train_ins_vit.py:308-316)."""
    p = predict.reshape(predict.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    num = jnp.sum(p * t, axis=1)
    den = p.sum(-1) + t.sum(-1)
    return jnp.mean((2 * num + smooth).sum(-1) / (den + smooth).sum(-1))


def binary_mask_from_labels(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """[H, W] int -> [num_classes, H, W] one-hot dropping class 0
    (_get_binary_mask, maskformer_train_ins_vit.py:318-323)."""
    onehot = jax.nn.one_hot(target, num_classes + 1, axis=0)
    return onehot[1:]


class ConfMatrix:
    """Streaming confusion matrix (semantic utils/metrics.py:7-100).

    add() drops pixels whose GT is class 0 (ignore), like the reference.
    """

    def __init__(self, num_classes: int, ignore_zero: bool = True):
        self.num_classes = num_classes
        self.ignore_zero = ignore_zero
        self.state = np.zeros((num_classes, num_classes), np.float64)

    def _cm(self, gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
        k = self.num_classes
        mask = (gt >= 0) & (gt < k) & (pred >= 0) & (pred < k)
        idx = gt[mask].astype(np.int64) * k + pred[mask].astype(np.int64)
        return np.bincount(idx, minlength=k * k).reshape(k, k).astype(np.float64)

    def add(self, gt: np.ndarray, pred: np.ndarray) -> None:
        gt = np.asarray(gt).flatten()
        pred = np.asarray(pred).flatten()
        if self.ignore_zero:
            pred = pred[gt != 0]
            gt = gt[gt != 0]
        if gt.size:
            self.state += self._cm(gt, pred)

    def add_batch(self, gt: np.ndarray, pred: np.ndarray) -> None:
        for g, p in zip(np.asarray(gt), np.asarray(pred)):
            self.add(g, p)

    def get_existing_classes(self) -> int:
        return int((self.state.sum(axis=1) > 0).sum())

    def norm_on_lines(self) -> np.ndarray:
        a = self.state
        b = self.state.sum(axis=1)[:, None]
        return np.divide(a, b, out=np.zeros_like(a), where=b != 0)

    def get_aa(self) -> float:
        return float(np.diagonal(self.norm_on_lines()).sum() / max(self.get_existing_classes(), 1))

    def get_sa(self) -> np.ndarray:
        return np.diagonal(self.norm_on_lines())

    def get_iou(self) -> np.ndarray:
        cm = self.state
        res = np.zeros(self.num_classes)
        for i in range(self.num_classes):
            den = cm[i, :].sum() + cm[:, i].sum() - cm[i, i]
            res[i] = cm[i, i] / den if den > 0 else 0.0
        return res

    def get_miou(self) -> float:
        """Mean IoU over classes with any support (GT or prediction mass).
        Averaging over the full range would include the structurally-empty
        ignore class 0 (pred = argmax + 1 never emits it and add() drops
        gt == 0), deflating the score by K/(K+1)."""
        iou = self.get_iou()
        present = (self.state.sum(axis=1) + self.state.sum(axis=0)) > 0
        if not present.any():
            return 0.0
        return float(iou[present].mean())


def psnr_metrics(pred, target, data_range: Optional[float] = None) -> float:
    from ..infer import psnr

    return float(psnr(pred, target, data_range))
