"""End-to-end downstream training on synthetic COCO-style data until the
eval stack measures real learning (round-2 verdict Do#7b: "proof the whole
train->eval stack measures learning, not just that it runs").

Task: each image carries 1-3 bright rectangles (visible in every modality);
instances = those rectangles, single class (ake150 NUM_CLASSES=1, building).
Trains the full MaskFormer stack (incomplete-fusion ViT backbone from
scratch, MSDA pixel decoder, Mask2Former decoder, set criterion with
on-device auction matching) with the reference recipe — loss
0.3ce+0.3dice+0.4mask, AdamW, full-model clip (maskformer_train_ins_vit.py)
— then evaluates instance mAP/AP50 through eval/coco_eval.CocoMaskEvaluator
and a binary foreground IoU.

Usage:
    python tools/train_downstream_synthetic.py --steps 400 --out DOWNSTREAM_E2E.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
IMG = 256
MAX_INST = 8


def make_sample(rng: np.random.Generator):
    """One image: background noise + K bright rectangles (all modalities)."""
    k = int(rng.integers(1, 4))
    x = {d: 0.3 * rng.standard_normal((IMG, IMG, CHANNELS[d])).astype(np.float32)
         for d in DOMAINS}
    masks = np.zeros((MAX_INST, IMG, IMG), np.float32)
    for i in range(k):
        h = int(rng.integers(40, 100))
        w = int(rng.integers(40, 100))
        r = int(rng.integers(0, IMG - h))
        c = int(rng.integers(0, IMG - w))
        masks[i, r : r + h, c : c + w] = 1.0
        for d in DOMAINS:
            x[d][r : r + h, c : c + w, :] += 2.0
    labels = np.full(MAX_INST, -1, np.int32)
    labels[:k] = 0
    valid = np.zeros(MAX_INST, bool)
    valid[:k] = True
    return x, masks, labels, valid


def make_batch(rng: np.random.Generator, b: int):
    xs, ms, ls, vs = [], [], [], []
    for _ in range(b):
        x, m, l, v = make_sample(rng)
        xs.append(x)
        ms.append(m)
        ls.append(l)
        vs.append(v)
    batch = {d: np.stack([s[d] for s in xs]) for d in DOMAINS}
    return batch, np.stack(ms), np.stack(ls), np.stack(vs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--clip", type=float, default=0.01)
    ap.add_argument("--eval_images", type=int, default=16)
    ap.add_argument("--frozen_stages", type=int, default=0,
                    help="0 = train everything from scratch; 11 = the "
                         "reference recipe (frozen encoder, trainable "
                         "pyramid/head) — much cheaper to compile")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from incomplete_multimodal_fusion_tpu.eval.coco_eval import CocoMaskEvaluator
    from incomplete_multimodal_fusion_tpu.infer_segmentation import (
        forward_instance_segmentation,
    )
    from incomplete_multimodal_fusion_tpu.losses.set_criterion import SegTargets
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel,
    )
    from incomplete_multimodal_fusion_tpu.train import downstream as ds

    cfg = MaskFormerConfig(frozen_stages=args.frozen_stages)
    model = MaskFormerModel(cfg)
    rng = np.random.default_rng(20260817)

    # fixed pool of training batches (the model must fit the task, not
    # memorize one array — rectangles differ across the pool)
    pool = [make_batch(rng, args.batch) for _ in range(8)]

    b0 = {d: jnp.asarray(pool[0][0][d]) for d in DOMAINS}
    params = model.init(jax.random.PRNGKey(0), b0)["params"]
    tx = ds.create_downstream_optimizer(
        params, lr=args.lr, clip_grad=args.clip,
        frozen_stages=args.frozen_stages)
    state = ds.DownstreamState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), rng=jax.random.PRNGKey(1),
    )
    step = jax.jit(
        ds.make_downstream_train_step(model, cfg, tx, match_mode="auction"),
        donate_argnums=0,
    )

    losses = []
    t0 = time.time()
    for i in range(args.steps):
        batch_np, masks, labels, valid = pool[i % len(pool)]
        batch = {d: jnp.asarray(batch_np[d]) for d in DOMAINS}
        targets = SegTargets(jnp.asarray(labels), jnp.asarray(masks),
                             jnp.asarray(valid))
        state, m = step(state, batch, targets)
        if i % 25 == 0 or i == args.steps - 1:
            l = float(m["loss"])
            losses.append((i, l))
            print(f"step {i}: loss {l:.4f} ({time.time()-t0:.0f}s)", flush=True)
            assert np.isfinite(l), "non-finite loss"

    # ---- eval on held-out images
    evaluator = CocoMaskEvaluator(num_classes=1, iou_type="segm")
    inter = union = 0.0
    n_eval_batches = max(1, args.eval_images // args.batch)
    for _ in range(n_eval_batches):
        ebatch_np, emasks, elabels, evalid = make_batch(rng, args.batch)
        ebatch = {d: jnp.asarray(ebatch_np[d]) for d in DOMAINS}
        results = forward_instance_segmentation(model, state.params, ebatch)
        for bi, res in enumerate(results):
            scores = np.asarray(res["scores"])
            keep = scores > 0.5
            pm = np.asarray(res["pred_masks"])[keep]
            pc = np.asarray(res["pred_classes"])[keep]
            ps = scores[keep]
            gm = emasks[bi][evalid[bi]]
            gc = elabels[bi][evalid[bi]]
            evaluator.add_image(pm, pc, ps, gm, gc)
            pred_fg = pm.any(0) if len(pm) else np.zeros((IMG, IMG), bool)
            gt_fg = gm.astype(bool).any(0)
            inter += float((pred_fg & gt_fg).sum())
            union += float((pred_fg | gt_fg).sum())

    stats = evaluator.summarize()
    iou = inter / max(union, 1.0)
    result = {
        "steps": args.steps,
        "batch": args.batch,
        "lr": args.lr,
        "clip": args.clip,
        "frozen_stages": args.frozen_stages,
        "loss_curve": losses,
        "loss_first": losses[0][1],
        "loss_last": losses[-1][1],
        "mAP": stats.get("AP"),
        "AP50": stats.get("AP50"),
        "AP75": stats.get("AP75"),
        "binary_foreground_iou": iou,
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
