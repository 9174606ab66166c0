#!/usr/bin/env python
"""Downstream segmentation training CLI
(reference downstream/*/main.py + maskformer_train_ins_vit.py harness:
cfg merge, dataset, epoch loop with dice eval every eval_freq epochs,
ReduceLROnPlateau, checkpoints every 10 epochs).

Tasks:
  * instance: COCO-json rgb/sar/dsm dataset (--coco_root/--coco_json)
  * semantic: quadruplet tree (--quad_root) with land-cover labels
  * synthetic (default): random rasters + block-instance targets
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args():
    p = argparse.ArgumentParser("MaskFormer TPU downstream training")
    p.add_argument("--task", choices=["instance", "semantic"], default="instance")
    p.add_argument("--epochs", type=int, default=51)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--clip_grad", type=float, default=0.01)
    p.add_argument("--num_classes", type=int, default=1)
    p.add_argument("--num_queries", type=int, default=100)
    p.add_argument("--dec_layers", type=int, default=3)
    p.add_argument("--num_points", type=int, default=12544)
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--frozen_stages", type=int, default=11)
    p.add_argument("--model_size", choices=["tiny", "base", "large"], default="tiny")
    p.add_argument("--backbone", default="vit",
                   choices=["vit", "vit_adapter", "swin", "resnet18", "resnet34",
                            "resnet50", "resnet101", "resnet152"])
    p.add_argument("--fusion_mode", default="crossattn", choices=["crossattn", "sup"])
    p.add_argument("--match_mode", default="exact",
                   choices=["exact", "auction", "greedy"],
                   help="Hungarian matching: exact scipy callback, on-device "
                        "epsilon-optimal auction, or greedy")
    p.add_argument("--pretrained", default="", help="pretraining checkpoint dir")
    p.add_argument("--coco_root", default="")
    p.add_argument("--coco_json", default="")
    p.add_argument("--quad_root", default="")
    p.add_argument("--ade_root", default="",
                   help="root dir the odgt fpath_img/fpath_segm are relative to")
    p.add_argument("--odgt", default="",
                   help="ADE20k-style odgt json-lines list (main_seg.py:64-92)")
    p.add_argument("--segm_downsampling_rate", type=int, default=1)
    p.add_argument("--output_dir", default="./save_downstream")
    p.add_argument("--eval_freq", type=int, default=50)
    p.add_argument("--save_freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--aug", action="store_true",
                   help="train-time geometric augmentation (rotate/scale/"
                        "translate/shear/flip, aug_strategy.py equivalents)")
    p.add_argument("--per_sample_masks", action="store_true",
                   help="independent token keep-mask per sample (default "
                        "mirrors the reference's batch-shared mask)")
    return p.parse_args()


def synthetic_instances(rng, b, s, num_classes, g=8):
    """Random rasters + rectangular instance targets."""
    from incomplete_multimodal_fusion_tpu.losses.set_criterion import SegTargets

    x = {
        "s1": rng.standard_normal((b, s, s, 1)).astype(np.float32),
        "s2": rng.standard_normal((b, s, s, 3)).astype(np.float32),
        "dem": rng.standard_normal((b, s, s, 1)).astype(np.float32),
    }
    labels = np.full((b, g), -1, np.int32)
    masks = np.zeros((b, g, s, s), np.float32)
    valid = np.zeros((b, g), bool)
    for i in range(b):
        n = rng.integers(1, 4)
        for j in range(n):
            h0, w0 = rng.integers(0, s // 2, 2)
            hh, ww = rng.integers(s // 8, s // 2, 2)
            masks[i, j, h0 : h0 + hh, w0 : w0 + ww] = 1.0
            labels[i, j] = rng.integers(0, num_classes)
            valid[i, j] = True
            # paint the object into the rasters so it is learnable
            for k in x:
                x[k][i, h0 : h0 + hh, w0 : w0 + ww] += 2.0 + labels[i, j]
    return x, SegTargets(labels, masks, valid)


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from incomplete_multimodal_fusion_tpu.config import MODEL_SIZES
    from incomplete_multimodal_fusion_tpu.losses.set_criterion import SegTargets
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel,
    )
    from incomplete_multimodal_fusion_tpu.parallel import mesh as mesh_lib
    from incomplete_multimodal_fusion_tpu.parallel import sharding as shard_lib
    from incomplete_multimodal_fusion_tpu.train import downstream as ds
    from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt_lib

    m = MODEL_SIZES[args.model_size]
    n_grid = (args.input_size // 16) ** 2
    cfg_kw = {}
    if args.odgt:
        # ADE20k odgt path is RGB-only (main_seg.py:64-92): the multimodal
        # backbones run with a single 's2' domain
        cfg_kw["in_domains"] = ("s2",)
    cfg = MaskFormerConfig(
        image_size=args.input_size,
        num_classes=args.num_classes,
        dim_tokens=m.dim_tokens, depth=m.depth, dim_head=m.dim_head, heads=m.heads,
        num_fusion_tokens=n_grid,
        num_queries=args.num_queries, dec_layers=args.dec_layers,
        frozen_stages=args.frozen_stages,
        backbone_type=args.backbone, fusion_mode=args.fusion_mode,
        **cfg_kw,
    )
    model = MaskFormerModel(cfg)
    rng = np.random.default_rng(args.seed)

    # data
    dense_masks = False
    if args.task == "instance" and args.coco_root:
        from incomplete_multimodal_fusion_tpu.data.coco_instance import (
            CocoInstanceDataset, coco_batch_iterator,
        )

        dset = CocoInstanceDataset(args.coco_root, args.coco_json, args.input_size)
        aug_cfg = None
        if args.aug:
            from incomplete_multimodal_fusion_tpu.data.augment import AugmentConfig

            aug_cfg = AugmentConfig()
        data_iter = coco_batch_iterator(dset, args.batch_size, seed=args.seed,
                                        augment=aug_cfg)
    elif args.task == "semantic" and args.odgt:
        from incomplete_multimodal_fusion_tpu.data.ade_odgt import (
            ADEOdgtDataset, ade_batch_iterator,
        )
        from incomplete_multimodal_fusion_tpu.losses.set_criterion import (
            targets_from_semantic_labels,
        )

        dense_masks = True  # criterion_seg.py:169-204 semantics
        ade_ds = ADEOdgtDataset(
            args.odgt, root=args.ade_root, img_size=args.input_size,
            segm_downsampling_rate=args.segm_downsampling_rate,
            flip=args.aug, seed=args.seed,
        )
        raw_iter = ade_batch_iterator(ade_ds, args.batch_size, seed=args.seed)

        def ade_iter():
            import jax.numpy as jnp

            for b in raw_iter:
                lab = jnp.asarray(b["label"].astype(np.int32))
                yield ({"s2": b["image"].astype(np.float32)},
                       targets_from_semantic_labels(lab, args.num_classes))

        data_iter = ade_iter()
    elif args.task == "semantic" and args.quad_root:
        from incomplete_multimodal_fusion_tpu.data.quadruplet import QuadrupletDataset
        from incomplete_multimodal_fusion_tpu.losses.set_criterion import (
            targets_from_semantic_labels,
        )

        dense_masks = True  # criterion_seg.py:169-204 uses dense flattened masks
        dset = QuadrupletDataset(args.quad_root, unlabeled=False,
                                 crop_size=args.input_size)

        def quad_iter():
            import jax.numpy as jnp

            aug_cfg = None
            if args.aug:
                from incomplete_multimodal_fusion_tpu.data.augment import (
                    AugmentConfig, augment_sample,
                )

                aug_cfg = AugmentConfig()

            idx = np.arange(len(dset))
            while True:
                rng.shuffle(idx)
                for start in range(0, len(dset) - args.batch_size + 1, args.batch_size):
                    samples = [dset[int(i)] for i in idx[start : start + args.batch_size]]
                    if aug_cfg is not None:
                        auged = []
                        for s in samples:
                            imgs = {k: s[k] for k in ("s1", "s2", "dem")}
                            imgs, _, lab = augment_sample(
                                imgs, rng, aug_cfg, label=s["label"],
                                label_cval=255,  # ignore_index padding
                            )
                            auged.append({**imgs, "label": lab})
                        samples = auged
                    batch = {
                        "s1": np.stack([s["s1"].transpose(1, 2, 0)[..., :1] for s in samples]),
                        "s2": np.stack([s["s2"].transpose(1, 2, 0)[..., :3] for s in samples]),
                        "dem": np.stack([s["dem"].transpose(1, 2, 0) for s in samples]),
                    }
                    lab = jnp.asarray(np.stack([s["label"] for s in samples]))
                    yield batch, targets_from_semantic_labels(lab, args.num_classes)

        data_iter = quad_iter()
    else:
        def synth_iter():
            while True:
                yield synthetic_instances(rng, args.batch_size, args.input_size,
                                          args.num_classes)

        data_iter = synth_iter()

    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        {k: jnp.asarray(v) for k, v in next(iter([next(data_iter)]))[0].items()},
    )["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.2f}M  queries={cfg.num_queries}")

    if args.pretrained:
        step_n = ckpt_lib.latest_step(args.pretrained)
        if step_n is not None:
            raw = ckpt_lib.restore_checkpoint(args.pretrained, None, step=step_n)
            pre_params = raw["params"] if isinstance(raw, dict) and "params" in raw else raw
            params, report = ds.load_pretrained_backbone(params, pre_params)
            print(f"restored {len(report['copied'])} backbone tensors from "
                  f"{args.pretrained} step {step_n}")

    tx = ds.create_downstream_optimizer(
        params, lr=args.lr, clip_grad=args.clip_grad, frozen_stages=args.frozen_stages
    )
    state = ds.DownstreamState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        rng=jax.random.PRNGKey(args.seed),
    )
    import math

    n_use = math.gcd(args.batch_size, jax.device_count())
    mesh = mesh_lib.make_mesh((n_use,), ("data",), devices=jax.devices()[:n_use])
    state = jax.device_put(state, shard_lib.replicated(mesh))
    step_fn = jax.jit(
        ds.make_downstream_train_step(
            model, cfg, tx, num_points=args.num_points,
            dense_masks=dense_masks, compute_dtype=args.compute_dtype,
            match_mode=args.match_mode, per_sample_masks=args.per_sample_masks,
        ),
        donate_argnums=0,
    )
    eval_fn = jax.jit(ds.make_eval_step(model, cfg))
    sem_pred_fn = jax.jit(ds.make_semantic_pred_step(
        model, cfg,
        out_size=args.input_size // max(args.segm_downsampling_rate, 1),
    ))

    sched = ds.ReduceLROnPlateau(lr=args.lr, mode="max")  # maximize dice
    os.makedirs(args.output_dir, exist_ok=True)
    t0 = time.time()
    for epoch in range(args.epochs):
        agg = {}
        for i in range(args.steps_per_epoch):
            batch, targets = next(data_iter)
            batch = shard_lib.shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, mesh
            )
            targets = jax.tree.map(jnp.asarray, targets)
            state, metrics = step_fn(state, batch, targets)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
            # non-finite-loss abort (reference pretrain_mmae.py:506-508
            # pattern; downstream fetches metrics each step anyway)
            if not np.isfinite(agg["loss"][-1]):
                print(f"Loss is {agg['loss'][-1]}, stopping training", flush=True)
                sys.exit(1)
        line = " ".join(f"{k}={np.mean(v):.4f}" for k, v in agg.items())
        print(f"epoch {epoch}: {line} lr={sched.lr:.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)
        # dice eval every eval_freq epochs + ReduceLROnPlateau
        # (maskformer_train_ins_vit.py:163-183)
        if (epoch + 1) % args.eval_freq == 0:
            eval_batch, eval_targets = next(data_iter)
            eval_batch = {k: jnp.asarray(v) for k, v in eval_batch.items()}
            gt = ds.label_map_from_targets(jax.tree.map(jnp.asarray, eval_targets))
            dice = float(eval_fn(state.params, eval_batch, gt))
            score = dice
            if args.task == "semantic":
                # ConfMatrix AA / mIoU eval (maskformer_train_seg.py:242-285)
                from incomplete_multimodal_fusion_tpu.eval.metrics import ConfMatrix

                pred = np.asarray(sem_pred_fn(state.params, eval_batch))
                cm = ConfMatrix(args.num_classes + 1)
                cm.add_batch(np.asarray(gt), pred)
                score = cm.get_miou()
                print(f"  eval AA={cm.get_aa():.4f} mIoU={score:.4f}", flush=True)
            new_lr = sched.step(score)
            state = state.replace(
                opt_state=ds.set_learning_rate(state.opt_state, new_lr)
            )
            print(f"  eval dice={dice:.4f} lr -> {new_lr:.2e}", flush=True)
        if (epoch + 1) % args.save_freq == 0 or epoch + 1 == args.epochs:
            ckpt_lib.save_checkpoint(args.output_dir, epoch + 1, state)
    print("done")


if __name__ == "__main__":
    main()
