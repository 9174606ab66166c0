"""Downstream segmentation inference handlers
(reference downstream/*/mask2former_infer.py:58-330 `Segmentation` and
mask2former_infer_seg.py tile-wise semantic inference).

Functional pipeline: preprocess (resize/pad to a multiple of
``size_divisibility``, per-modality normalize) -> MaskFormer forward ->
upsample masks -> {semantic | instance | panoptic} postprocess -> optional
color overlay saved to PNG.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .eval.metrics import instance_inference, semantic_inference


def pad_to_divisible(img: jnp.ndarray, div: int = 32) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad NHWC to a multiple of div (mask2former_infer.py:136-150)."""
    b, h, w = img.shape[:3]
    ph = (div - h % div) % div
    pw = (div - w % div) % div
    out = jnp.pad(img, ((0, 0), (0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 3))
    return out, (h, w)


def sem_seg_postprocess(result: jnp.ndarray, img_size: Tuple[int, int],
                        out_size: Tuple[int, int]) -> jnp.ndarray:
    """Crop padding then resize to the original size (detectron2-style
    sem_seg_postprocess used at mask2former_infer.py:172-177)."""
    r = result[..., : img_size[0], : img_size[1]]
    return jax.image.resize(r, r.shape[:-2] + tuple(out_size), method="bilinear")


def forward_segmentation(
    model,
    params,
    inputs: Dict[str, jnp.ndarray],
    num_classes: int,
    drop_modalities: Sequence[str] = (),
) -> jnp.ndarray:
    """Semantic map per image (argmax over semantic_inference; the semantic
    reference writes argmax+1 to skip the ignore class,
    mask2former_infer_seg.py:239)."""
    present = jnp.asarray([d not in drop_modalities for d in model.cfg.in_domains])
    if drop_modalities:
        from .ops import masking

        b = inputs[model.cfg.in_domains[0]].shape[0]
        n = model.cfg.num_patches
        masks = {
            d: jnp.full((b, n), 0 if d not in drop_modalities else 1, jnp.int32)
            for d in model.cfg.in_domains
        }
        mi = masking.mask_info_from_task_masks(
            masks, model.cfg.in_domains, n * len(model.cfg.in_domains)
        )
        out = model.apply({"params": params}, inputs, mask_info=mi,
                          num_encoded_tokens=n * len(model.cfg.in_domains),
                          present=present)
    else:
        out = model.apply({"params": params}, inputs)
    h, w = inputs[model.cfg.in_domains[0]].shape[1:3]
    masks = jax.image.resize(
        out["pred_masks"], out["pred_masks"].shape[:2] + (h, w), method="bilinear"
    )
    sem = semantic_inference(out["pred_logits"], masks)
    return jnp.argmax(sem, axis=1) + 1  # +1: class 0 is ignore


def forward_instance_segmentation(
    model, params, inputs: Dict[str, jnp.ndarray], topk: int = 100
) -> Dict[str, jnp.ndarray]:
    """Per-image instances (mask2former_infer.py instance path)."""
    out = model.apply({"params": params}, inputs)
    h, w = inputs[model.cfg.in_domains[0]].shape[1:3]
    masks = jax.image.resize(
        out["pred_masks"], out["pred_masks"].shape[:2] + (h, w), method="bilinear"
    )
    results = []
    for b in range(masks.shape[0]):
        results.append(
            instance_inference(out["pred_logits"][b], masks[b],
                               model.cfg.num_classes, topk=topk)
        )
    return results


def panoptic_inference(
    mask_cls: jnp.ndarray,  # [Q, K+1]
    mask_pred: jnp.ndarray,  # [Q, H, W] logits
    object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
    thing_ids: Optional[Sequence[int]] = None,
) -> Tuple[jnp.ndarray, list]:
    """Mask2Former panoptic postprocess (mask2former_infer.py:288-345):
    keep confident non-void queries, argmax over score-weighted masks, paint
    each segment as (argmax region) & (sigmoid >= 0.5), drop poor-overlap
    segments, and MERGE same-class stuff regions into one segment
    (stuff_memory_list, :313-331). `thing_ids` = contiguous class ids that
    are instances (e.g. `data.ade_metadata.thing_ids()`); None = all classes
    are things (no merging)."""
    scores = jax.nn.softmax(mask_cls, axis=-1)
    labels = jnp.argmax(scores, axis=-1)
    conf = jnp.max(scores[:, :-1], axis=-1)
    keep = (labels != mask_cls.shape[-1] - 1) & (conf > object_mask_threshold)

    probs = jax.nn.sigmoid(mask_pred)
    weighted = jnp.where(keep[:, None, None], conf[:, None, None] * probs, -1e4)
    assign = jnp.argmax(weighted, axis=0)  # [H, W] query id

    things = None if thing_ids is None else set(int(t) for t in thing_ids)
    pan = np.zeros(mask_pred.shape[1:], np.int32)
    segments = []
    sid = 0
    stuff_memory = {}  # class id -> segment id (merge stuff regions)
    assign_np = np.asarray(assign)
    probs_np = np.asarray(probs)
    keep_np = np.asarray(keep)
    labels_np = np.asarray(labels)
    for q in range(mask_pred.shape[0]):
        if not keep_np[q]:
            continue
        cls = int(labels_np[q])
        isthing = things is None or cls in things
        region = assign_np == q
        orig = probs_np[q] >= 0.5
        mask = region & orig
        if region.sum() == 0 or orig.sum() == 0 or mask.sum() == 0:
            continue
        if region.sum() / orig.sum() < overlap_threshold:
            continue
        if not isthing and cls in stuff_memory:
            pan[mask] = stuff_memory[cls]
            continue
        sid += 1
        if not isthing:
            stuff_memory[cls] = sid
        pan[mask] = sid
        segments.append({"id": sid, "category_id": cls, "isthing": isthing})
    return jnp.asarray(pan), segments


def semantic_inference_with_tta(
    model,
    params,
    inputs: Dict[str, jnp.ndarray],
    scales: Sequence[float] = (0.75, 1.0, 1.25),
    flip: bool = True,
) -> jnp.ndarray:
    """Multi-scale + horizontal-flip test-time augmentation
    (reference utils/test_time_augmentation.py:21-100
    SemanticSegmentorWithTTA): average the per-class probability maps over
    the augmented views. Returns [B, K, H, W] averaged probabilities."""
    base_hw = inputs[model.cfg.in_domains[0]].shape[1:3]
    acc = None
    count = 0

    def run(x):
        out = model.apply({"params": params}, x)
        masks = jax.image.resize(
            out["pred_masks"], out["pred_masks"].shape[:2] + tuple(base_hw),
            method="bilinear",
        )
        return semantic_inference(out["pred_logits"], masks)

    if model.cfg.backbone_type.startswith("vit"):
        # the fusion-token ViT is fixed-size (fusion grid == patch grid);
        # TTA reduces to flipping, like the reference's ViT usage
        scales = (1.0,)

    views = []
    for s in scales:
        hw = (max(32, int(base_hw[0] * s) // 32 * 32),
              max(32, int(base_hw[1] * s) // 32 * 32))
        x_s = {
            k: (jax.image.resize(v, v.shape[:1] + hw + v.shape[3:], method="bilinear")
                if v.ndim == 4 else v)
            for k, v in inputs.items()
        }
        views.append((x_s, False))
        if flip:
            views.append(({k: (v[:, :, ::-1] if v.ndim == 4 else v)
                           for k, v in x_s.items()}, True))
    for x_v, flipped in views:
        sem = run(x_v)
        if flipped:
            sem = sem[..., ::-1]
        acc = sem if acc is None else acc + sem
        count += 1
    return acc / count


# Land-cover style colormap (role of the reference's Color2Index table,
# multimodal_quadruplet.py:19-48)
DEFAULT_COLORS = np.asarray(
    [
        [0, 0, 0], [65, 155, 223], [57, 125, 73], [136, 176, 83],
        [122, 135, 198], [228, 150, 53], [223, 195, 90], [196, 40, 27],
        [165, 155, 143], [179, 159, 225], [97, 34, 155], [255, 255, 255],
    ],
    np.uint8,
)


def colorize_labels(label_map: np.ndarray, colors: Optional[np.ndarray] = None) -> np.ndarray:
    colors = DEFAULT_COLORS if colors is None else colors
    return colors[np.clip(np.asarray(label_map), 0, len(colors) - 1)]


def _mask_boundary(sel: np.ndarray) -> np.ndarray:
    """Boundary pixels of a binary mask (mask minus its 4-neighbor erosion).
    Zero-padded shifts, not np.roll: wraparound would treat image-border
    pixels of an edge-to-edge mask as interior and drop their outline."""
    p = np.pad(sel, 1, constant_values=False)
    er = (sel & p[:-2, 1:-1] & p[2:, 1:-1] & p[1:-1, :-2] & p[1:-1, 2:])
    return sel & ~er


def overlay_instances(
    image: np.ndarray,  # [H, W, 3] in any range
    instances: Dict[str, "np.ndarray"],
    score_threshold: float = 0.5,
    alpha: float = 0.5,
    colors: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    draw_labels: bool = True,
) -> np.ndarray:
    """Blend instance masks over an image with boundary outlines and
    "name score%" labels at each mask centroid (the detectron2 Visualizer's
    draw_instance_predictions role, utils/visualizer.py:1-1243)."""
    colors = DEFAULT_COLORS if colors is None else colors
    img = np.asarray(image, np.float32)
    img = (img - img.min()) / max(img.max() - img.min(), 1e-6) * 255.0
    out = img.copy()
    scores = np.asarray(instances["scores"])
    keep = scores >= score_threshold
    masks = np.asarray(instances["pred_masks"])[keep]
    scores = scores[keep]
    classes = (np.asarray(instances["pred_classes"])[keep]
               if "pred_classes" in instances else np.zeros(len(masks), np.int64))
    labels = []
    for i, m in enumerate(masks):
        color = colors[(i + 1) % len(colors)].astype(np.float32)
        sel = np.asarray(m) > 0.5
        if not sel.any():
            continue
        out[sel] = (1 - alpha) * out[sel] + alpha * color
        out[_mask_boundary(sel)] = color  # solid outline
        ys, xs = np.nonzero(sel)
        name = (class_names[int(classes[i])]
                if class_names is not None and int(classes[i]) < len(class_names)
                else str(int(classes[i])))
        labels.append((float(xs.mean()), float(ys.mean()),
                       f"{name} {scores[i] * 100:.0f}%"))
    out = out.astype(np.uint8)
    if draw_labels and labels:
        try:
            from PIL import Image, ImageDraw  # type: ignore

            pil = Image.fromarray(out)
            draw = ImageDraw.Draw(pil)
            for cx, cy, text in labels:
                # 1px shadow for contrast on any background
                draw.text((cx + 1, cy + 1), text, fill=(0, 0, 0))
                draw.text((cx, cy), text, fill=(255, 255, 255))
            out = np.asarray(pil)
        except ImportError:
            pass  # labels need PIL; the blended overlay still returns
    return out


def save_segmentation_png(label_map: np.ndarray, path: str,
                          colors: Optional[np.ndarray] = None) -> str:
    """Write a colorized *_seg.png (mask2former_infer.py:211-226 role)."""
    rgb = colorize_labels(label_map, colors)
    try:
        from PIL import Image  # type: ignore

        Image.fromarray(rgb).save(path)
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, rgb)
    return path
