"""Convert a reference PyTorch MultiMAE checkpoint to a native orbax
checkpoint this framework restores directly (MIGRATION.md "Checkpoints";
role of the reference's utils/checkpoint.py load path + misc.py
load_parallal_model DDP-prefix stripping).

Usage:
    python scripts/convert_checkpoint.py mmae_checkpoint.pth ./save_attention \
        --in_domains s1-s2-dem --out_domains s1-s2-dem

The converted tree is numerically pinned by tests/test_fullmodel_parity.py
(full-forward bit-parity on transplanted weights). Requires torch only for
reading the .pth — the output is torch-free.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from incomplete_multimodal_fusion_tpu import modalities as modreg
from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
    convert_multimae_state, strip_prefixes)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help=".pth file (raw state dict or {'model': ...})")
    p.add_argument("output_dir", help="orbax checkpoint directory to write")
    p.add_argument("--in_domains", default="s1-s2-dem", help="hyphen separated")
    p.add_argument("--out_domains", default=None, help="default: in_domains")
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--decoder_depth", type=int, default=2)
    p.add_argument("--fusion_mode", default="crossattn",
                   choices=["crossattn", "crossattn_v1"])
    p.add_argument("--arch", default="multimae",
                   choices=["multimae", "maskformer"],
                   help="multimae = pretraining checkpoint; maskformer = "
                        "downstream (backbone + pixel decoder + predictor)")
    p.add_argument("--enc_layers", type=int, default=2)
    p.add_argument("--dec_layers", type=int, default=3)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--step", type=int, default=0, help="step label for the ckpt")
    args = p.parse_args(argv)

    import torch  # local import: only the reader needs it

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    state = raw.get("model", raw) if isinstance(raw, dict) else raw
    state = {k: np.asarray(v) for k, v in strip_prefixes(state).items()}

    in_domains = tuple(args.in_domains.split("-"))
    out_domains = tuple((args.out_domains or args.in_domains).split("-"))

    if args.arch == "maskformer":
        from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
            convert_maskformer_state)

        params = convert_maskformer_state(
            state, in_domains, depth=args.depth, enc_layers=args.enc_layers,
            dec_layers=args.dec_layers, hidden_dim=args.hidden_dim,
        )
    else:
        # channel counts only matter for the pretraining decoders; resolving
        # them here keeps --arch maskformer usable with unregistered domains
        out_channels = {d: modreg.get(d).num_channels for d in out_domains}
        params = convert_multimae_state(
            state, in_domains, out_domains, out_channels,
            patch_size=args.patch_size, depth=args.depth,
            decoder_depth=args.decoder_depth, fusion_mode=args.fusion_mode,
        )

    from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt_lib

    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_lib.save_checkpoint(args.output_dir, args.step, {"params": params})
    n = sum(int(np.asarray(x).size) for x in _leaves(params))
    print(f"converted {len(state)} torch tensors -> {args.output_dir} "
          f"(step {args.step}, {n / 1e6:.2f}M params)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
