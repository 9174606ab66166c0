"""End-to-end SEMANTIC segmentation learning proof: train the MaskFormer
stack with the dense-mask semantic criterion (reference
maskformer_train_seg.py recipe: per-class region targets, dense sigmoid-CE +
dice instead of PointRend sampling) on synthetic 3-class land-cover-style
data, then evaluate per-pixel mIoU/AA through `make_semantic_pred_step` +
`eval.metrics.ConfMatrix` — the companion of tools/train_downstream_synthetic
.py's instance-mAP proof (round-2 verdict Weak #4).

Classes (1-based in GT maps, 0 = ignore — none here): 1 background field,
2 bright rectangles ("built"), 3 dark horizontal bands ("water").

Usage:
    python tools/train_semantic_synthetic.py --steps 300 [--cpu --tiny]
Writes DOWNSTREAM_SEMANTIC_E2E.json next to the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
K = 3  # semantic classes


def make_sample(rng: np.random.Generator, img: int):
    label = np.ones((img, img), np.int32)  # class 1 background
    # class 3: 1-2 horizontal bands, >= img/6 thick — the mask head predicts
    # at image/4 resolution, so features must survive 4x downsampling
    for _ in range(rng.integers(1, 3)):
        y0 = int(rng.integers(0, img - img // 4))
        label[y0:y0 + int(rng.integers(img // 6, img // 3))] = 3
    # class 2: 1-3 bright rectangles (drawn last: wins overlaps)
    for _ in range(rng.integers(1, 4)):
        h, w = rng.integers(10, img // 2, 2)
        y0 = int(rng.integers(0, img - h))
        x0 = int(rng.integers(0, img - w))
        label[y0:y0 + h, x0:x0 + w] = 2
    # render modalities from the label map + noise
    base = {1: 0.0, 2: 1.5, 3: -1.5}
    field = np.zeros((img, img), np.float32)
    for c, v in base.items():
        field[label == c] = v
    x = {}
    for d in DOMAINS:
        ch = CHANNELS[d]
        x[d] = (field[..., None] + 0.3 * rng.standard_normal((img, img, ch))
                ).astype(np.float32)
    return x, label


def make_batch(rng, b, img):
    xs, labels = zip(*(make_sample(rng, img) for _ in range(b)))
    batch = {d: np.stack([s[d] for s in xs]) for d in DOMAINS}
    label_map = np.stack(labels)  # [B, H, W] 1-based
    # per-class region targets with RAW 1-based labels — the reference
    # semantic convention (maskformer_train_seg.py:318-323 _get_binary_mask
    # keeps onehot[1:], :305 semantic_inference drops softmax channel 0):
    # model num_classes = K+1, channel 0 dead, channels 1..K real, void last
    masks = np.stack([np.stack([(lm == c + 1) for c in range(K)])
                      for lm in labels]).astype(np.float32)  # [B, K, H, W]
    tlabels = np.tile(np.arange(1, K + 1, dtype=np.int32), (b, 1))
    valid = masks.reshape(b, K, -1).any(-1)
    return batch, masks, tlabels, valid, label_map


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval_images", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (dim 32 / depth 2 / image 64) — CPU-feasible")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from incomplete_multimodal_fusion_tpu.eval.metrics import ConfMatrix
    from incomplete_multimodal_fusion_tpu.losses.set_criterion import SegTargets
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel,
    )
    from incomplete_multimodal_fusion_tpu.train import downstream as ds

    if args.tiny:
        cfg = MaskFormerConfig(
            num_classes=K + 1, image_size=64, dim_tokens=32, depth=2, dim_head=8,
            heads=2, num_fusion_tokens=16, conv_dim=32, mask_dim=32,
            transformer_enc_layers=1, num_queries=8, dec_layers=2,
            dim_feedforward=64, frozen_stages=0,
        )
    else:
        cfg = MaskFormerConfig(num_classes=K + 1, num_queries=20, frozen_stages=0)
    img = cfg.image_size
    model = MaskFormerModel(cfg)
    rng = np.random.default_rng(20260818)

    pool = [make_batch(rng, args.batch, img) for _ in range(8)]
    b0 = {d: jnp.asarray(pool[0][0][d]) for d in DOMAINS}
    params = model.init(jax.random.PRNGKey(0), b0)["params"]
    tx = ds.create_downstream_optimizer(params, lr=args.lr, clip_grad=0.01,
                                        frozen_stages=cfg.frozen_stages)
    state = ds.DownstreamState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=tx.init(params),
                               rng=jax.random.PRNGKey(1))
    step = jax.jit(
        ds.make_downstream_train_step(
            model, cfg, tx, dense_masks=True, match_mode="greedy",
            compute_dtype="float32" if args.cpu else "bfloat16"),
        donate_argnums=0,
    )

    losses = []
    t0 = time.time()
    for i in range(args.steps):
        batch_np, masks, tlabels, valid, _ = pool[i % len(pool)]
        batch = {d: jnp.asarray(batch_np[d]) for d in DOMAINS}
        targets = SegTargets(jnp.asarray(tlabels), jnp.asarray(masks),
                             jnp.asarray(valid))
        state, m = step(state, batch, targets)
        if i % 25 == 0 or i == args.steps - 1:
            l = float(m["loss"])
            losses.append((i, l))
            print(f"step {i}: loss {l:.4f} ({time.time()-t0:.0f}s)", flush=True)
            assert np.isfinite(l), "non-finite loss"

    # ---- held-out per-pixel eval; preds run 1..K+1 (K+1 = void wins)
    pred_step = jax.jit(ds.make_semantic_pred_step(model, cfg))
    cm = ConfMatrix(K + 2)  # 1-based classes, 0 = ignore, K+1 = void
    n_eval = max(1, args.eval_images // args.batch)
    for _ in range(n_eval):
        ebatch_np, _, _, _, elabel = make_batch(rng, args.batch, img)
        ebatch = {d: jnp.asarray(ebatch_np[d]) for d in DOMAINS}
        pred = np.asarray(pred_step(state.params, ebatch))  # [B, H, W] 1-based
        cm.add(elabel, pred)

    per_class = cm.get_iou()[1:K + 1]  # the K real classes
    miou = float(np.mean(per_class))
    aa = float(cm.get_aa())
    result = {
        "task": "semantic_synthetic_3class",
        "steps": args.steps,
        "loss_first": losses[0][1],
        "loss_last": losses[-1][1],
        "miou": miou,
        "aa": aa,
        "per_class_iou": [float(v) for v in per_class],
    }
    print(json.dumps(result))
    out = args.out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DOWNSTREAM_SEMANTIC_E2E.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
