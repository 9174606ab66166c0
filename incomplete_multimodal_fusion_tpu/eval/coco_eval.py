"""COCO-style mask AP evaluation
(reference downstream/*/utils/cocoeval.py:1-535 + cocoeval_improve.py SelfEval,
both pycocotools-dependent; this is a self-contained numpy implementation of
the same protocol: per-class greedy IoU matching at 10 thresholds
0.5:0.05:0.95, 101-point interpolated PR curves, mAP / AP50 / AP75).

Masks are dense binary arrays (the framework's instance outputs), not RLE.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0.0, 1.0, 101)


def mask_iou(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """pred [P, H, W], gt [G, H, W] binary -> IoU [P, G]."""
    p = pred.reshape(pred.shape[0], -1).astype(np.float32)
    g = gt.reshape(gt.shape[0], -1).astype(np.float32)
    inter = p @ g.T
    union = p.sum(1)[:, None] + g.sum(1)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


class CocoMaskEvaluator:
    """Streaming evaluator: add per-image predictions + GT, then summarize."""

    def __init__(self, num_classes: int, max_dets: int = 100):
        self.num_classes = num_classes
        self.max_dets = max_dets
        # per class: list of (score, matched@thr[10]) plus GT count
        self._scores: Dict[int, List[np.ndarray]] = {c: [] for c in range(num_classes)}
        self._matched: Dict[int, List[np.ndarray]] = {c: [] for c in range(num_classes)}
        self._n_gt = np.zeros(num_classes, np.int64)

    def add_image(
        self,
        pred_masks: np.ndarray,  # [P, H, W] binary
        pred_classes: np.ndarray,  # [P]
        pred_scores: np.ndarray,  # [P]
        gt_masks: np.ndarray,  # [G, H, W] binary
        gt_classes: np.ndarray,  # [G]
    ) -> None:
        order = np.argsort(-np.asarray(pred_scores))[: self.max_dets]
        pred_masks = np.asarray(pred_masks)[order]
        pred_classes = np.asarray(pred_classes)[order]
        pred_scores = np.asarray(pred_scores)[order]
        gt_masks = np.asarray(gt_masks)
        gt_classes = np.asarray(gt_classes)

        for c in range(self.num_classes):
            p_idx = np.nonzero(pred_classes == c)[0]
            g_idx = np.nonzero(gt_classes == c)[0]
            self._n_gt[c] += len(g_idx)
            if len(p_idx) == 0:
                continue
            matched = np.zeros((len(p_idx), len(IOU_THRS)), bool)
            if len(g_idx):
                ious = mask_iou(pred_masks[p_idx], gt_masks[g_idx])
                for ti, thr in enumerate(IOU_THRS):
                    taken = np.zeros(len(g_idx), bool)
                    for pi in range(len(p_idx)):  # preds already score-sorted
                        best, best_g = thr, -1
                        for gi in range(len(g_idx)):
                            if taken[gi] or ious[pi, gi] < best:
                                continue
                            best, best_g = ious[pi, gi], gi
                        if best_g >= 0:
                            taken[best_g] = True
                            matched[pi, ti] = True
            self._scores[c].append(pred_scores[p_idx])
            self._matched[c].append(matched)

    def _ap_per_class(self, c: int) -> Optional[np.ndarray]:
        if self._n_gt[c] == 0:
            return None
        if not self._scores[c]:
            return np.zeros(len(IOU_THRS))
        scores = np.concatenate(self._scores[c])
        matched = np.concatenate(self._matched[c], axis=0)
        order = np.argsort(-scores)
        matched = matched[order]
        aps = np.zeros(len(IOU_THRS))
        for ti in range(len(IOU_THRS)):
            tp = np.cumsum(matched[:, ti])
            fp = np.cumsum(~matched[:, ti])
            recall = tp / self._n_gt[c]
            precision = tp / np.maximum(tp + fp, 1)
            # monotone precision envelope + 101-pt interpolation (COCO)
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            idx = np.searchsorted(recall, RECALL_THRS, side="left")
            pr = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
            aps[ti] = pr.mean()
        return aps

    def summarize(self) -> Dict[str, float]:
        per_class = [self._ap_per_class(c) for c in range(self.num_classes)]
        valid = [a for a in per_class if a is not None]
        if not valid:
            return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}
        aps = np.stack(valid)  # [C, T]
        return {
            "AP": float(aps.mean()),
            "AP50": float(aps[:, 0].mean()),
            "AP75": float(aps[:, 5].mean()),
            "per_class_AP": [float(a.mean()) if a is not None else -1.0 for a in per_class],
        }


def predictions_to_coco_json(
    image_ids: Sequence[int],
    results: Sequence[Dict],
    category_offset: int = 1,
) -> List[Dict]:
    """COCO-format prediction dump (reference mask2former_infer2json.py
    build_coco_results :86-220) with uncompressed RLE masks."""
    out = []
    for img_id, res in zip(image_ids, results):
        masks = np.asarray(res["pred_masks"])
        classes = np.asarray(res["pred_classes"])
        scores = np.asarray(res["scores"])
        for m, c, s in zip(masks, classes, scores):
            col = np.asarray(m, bool).T.flatten()  # column-major RLE
            # uncompressed counts
            counts = []
            prev, run = False, 0
            for v in col:
                if v == prev:
                    run += 1
                else:
                    counts.append(run)
                    prev, run = v, 1
            counts.append(run)
            out.append({
                "image_id": int(img_id),
                "category_id": int(c) + category_offset,
                "score": float(s),
                "segmentation": {"size": list(m.shape), "counts": counts},
            })
    return out
