"""Freeze golden tensors from the reference's vendored DETR Transformer
(downstream/semantic_segmentation/modeling/transformer_decoder/
transformer.py:19-369 — torch-only imports, so it executes standalone).

Exercises BOTH layer norm orders (normalize_before False/True) with a
1-layer encoder + 2-layer intermediate-returning decoder, the exact stack
`StandardTransformerDecoder` (maskformer_transformer_decoder.py:36-45)
builds. `tests/test_detr_parity.py` replays the weights through the JAX
`models/maskformer_decoder.py` layers WITHOUT torch at runtime.

Usage (one-off, requires torch):
    python tests/golden/generate_detr_golden.py
"""
import importlib.util

import numpy as np
import torch

REF = ("/root/reference/downstream/semantic_segmentation/modeling/"
       "transformer_decoder/transformer.py")


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


tr = load("ref_detr_transformer", REF)

out = {}
rng = np.random.default_rng(20260817)

B, C, H, W, Q = 2, 32, 4, 5, 7
src = rng.standard_normal((B, C, H, W)).astype(np.float32)
pos = rng.standard_normal((B, C, H, W)).astype(np.float32) * 0.5
query = rng.standard_normal((Q, C)).astype(np.float32)
out["src"], out["pos"], out["query"] = src, pos, query

for pre in (False, True):
    tag = "pre" if pre else "post"
    torch.manual_seed(7 if pre else 3)
    model = tr.Transformer(
        d_model=C, nhead=4, num_encoder_layers=1, num_decoder_layers=2,
        dim_feedforward=64, dropout=0.0, normalize_before=pre,
        return_intermediate_dec=True,
    ).eval()
    with torch.no_grad():
        hs, memory = model(
            torch.from_numpy(src), None, torch.from_numpy(query),
            torch.from_numpy(pos),
        )
    out[f"{tag}_hs"] = hs.numpy()            # [L, B, Q, C]
    out[f"{tag}_memory"] = memory.numpy()    # [B, C, H, W]
    for k, v in model.state_dict().items():
        out[f"{tag}_w_{k}"] = v.numpy()

np.savez_compressed("tests/golden/detr_golden.npz", **out)
print("wrote tests/golden/detr_golden.npz:", len(out), "arrays")
