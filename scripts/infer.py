#!/usr/bin/env python
"""MAE reconstruction inference CLI (reference pretraining/infer_mmae.py:291-362):
load a pretraining checkpoint, forward one tile with seeded masking (or
modality ablation), report per-modality masked-patch PSNR, write the
masked-input / prediction / GT grid to output.jpg.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser("MultiMAE TPU inference")
    p.add_argument("--ckpt_dir", default="./save_attention")
    p.add_argument("--model_size", default="tiny", choices=["tiny", "base", "large"])
    p.add_argument("--fusion_mode", default="crossattn",
                   choices=["crossattn", "zorro", "lstm"])
    p.add_argument("--in_domains", default="s1-s2-dem")
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--num_encoded_tokens", type=int, default=256)  # infer_mmae.py:330
    p.add_argument("--seed", type=int, default=1)  # torch.manual_seed(1)
    p.add_argument("--drop", default="", help="modalities to ablate, hyphen separated")
    p.add_argument("--data_path", default="", help="DFC2023 tree; synthetic if empty")
    p.add_argument("--tile_index", type=int, default=0)
    p.add_argument("--output", default="output.jpg")
    return p.parse_args()


def main():
    args = get_args()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from incomplete_multimodal_fusion_tpu import infer as infer_lib
    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MODEL_SIZES, PretrainConfig,
    )
    from incomplete_multimodal_fusion_tpu.models.multimae import build_multimae
    from incomplete_multimodal_fusion_tpu.train import pretrain
    from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt_lib

    domains = tuple(args.in_domains.split("-"))
    n_grid = (args.input_size // 16) ** 2
    model_cfg = dataclasses.replace(
        MODEL_SIZES[args.model_size],
        num_fusion_tokens=n_grid, fusion_mode=args.fusion_mode,
    )
    cfg = PretrainConfig(
        model=model_cfg,
        data=DataConfig(input_size=args.input_size, in_domains=domains,
                        out_domains=domains, batch_size=1),
    )
    model = build_multimae(cfg)
    params = pretrain.init_model(model, cfg, jax.random.PRNGKey(0))
    step = ckpt_lib.latest_step(args.ckpt_dir)
    if step is not None:
        params = ckpt_lib.restore_params(args.ckpt_dir, params)
        print(f"restored params from {args.ckpt_dir} step {step}")
    else:
        print("WARNING: no checkpoint found; using random init")

    if args.data_path:
        from incomplete_multimodal_fusion_tpu.data.dfc2023 import DFC2023Dataset

        s = DFC2023Dataset(args.data_path, size=args.input_size)[args.tile_index]
        x = {k: jnp.asarray(v.transpose(1, 2, 0))[None] for k, v in s.items()
             if k in domains}
    else:
        from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch

        x = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(args.seed), domains, 1, args.input_size).items()}

    drop = tuple(d for d in args.drop.split("-") if d)
    res = infer_lib.infer(
        model, params, x, args.num_encoded_tokens,
        rng=jax.random.PRNGKey(args.seed), drop_modalities=drop,
    )
    for d in domains:
        m = res.task_masks[d]
        if int(np.asarray(m).sum()) == 0:
            print(f"{d}: fully visible (no reconstruction target)")
            continue
        n_masked = f"({int(np.asarray(m)[0].sum())}/{m.shape[1]} patches masked)"
        if np.asarray(x[d]).ndim == 3:  # semseg modality: report pixel accuracy
            pred_cls = np.argmax(np.asarray(res.preds[d]), axis=-1)
            acc = float((pred_cls == np.asarray(x[d])).mean())
            print(f"{d}: class-map pixel accuracy {acc:.3f} {n_masked}")
        else:
            p = float(infer_lib.masked_psnr(res.preds[d], x[d], m, 16))
            print(f"{d}: masked-patch PSNR {p:.2f} dB {n_masked}")
    out = infer_lib.plot_reconstructions(
        {k: np.asarray(v) for k, v in x.items()}, res, 16, args.output
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
