"""Export the flagship MultiMAE inference forward as a serialized StableHLO
serving artifact (serving.py / jax.export): weights baked in, reloads on the
serving host with jax alone — no flax, no model source, no checkpoint.

Usage:
    python scripts/export_serving.py ./save_attention model.stablehlo \
        --in_domains s1-s2-dem --batch 1 --input_size 256

The artifact's flat signature is (x_<d0>..x_<dk>, mask_<d0>..mask_<dk>) with
masks [B, num_patches] int32 (1 = drop that patch / modality — the
incomplete-fusion contract, multimae_crossattn.py:395-399). Parity with the
live forward is pinned by tests/test_serving.py.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint_dir", help="orbax checkpoint dir "
                   "(scripts/pretrain.py output or convert_checkpoint.py)")
    p.add_argument("output", help="artifact path, e.g. model.stablehlo")
    p.add_argument("--in_domains", default="s1-s2-dem")
    p.add_argument("--model_size", default="tiny",
                   choices=["tiny", "base", "large"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--fusion_mode", default="crossattn")
    args = p.parse_args(argv)

    import dataclasses

    import jax

    from incomplete_multimodal_fusion_tpu import config as cfg_lib, serving
    from incomplete_multimodal_fusion_tpu.models.multimae import build_multimae
    from incomplete_multimodal_fusion_tpu.train import pretrain
    from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt_lib

    domains = tuple(args.in_domains.split("-"))
    model_cfg = dataclasses.replace(
        cfg_lib.MODEL_SIZES[args.model_size],
        fusion_mode=args.fusion_mode,
        num_fusion_tokens=(args.input_size // args.patch_size) ** 2,
    )
    cfg = cfg_lib.PretrainConfig(
        model=model_cfg,
        data=dataclasses.replace(
            cfg_lib.DataConfig(), in_domains=domains, out_domains=domains,
            input_size=args.input_size, patch_size=args.patch_size,
        ),
    )
    model = build_multimae(cfg)
    template = pretrain.init_model(model, cfg, jax.random.PRNGKey(0))
    params = ckpt_lib.restore_params(args.checkpoint_dir, template)

    blob = serving.export_infer(model, params, batch=args.batch,
                                image_size=args.input_size)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.2f} MB serving artifact -> "
          f"{args.output} (batch={args.batch}, {args.input_size}^2, "
          f"domains={'-'.join(domains)})")


if __name__ == "__main__":
    main()
