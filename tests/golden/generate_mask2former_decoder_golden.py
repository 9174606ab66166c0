"""Freeze golden tensors from the reference MultiScaleMaskedTransformerDecoder
(downstream/instance_segmentation/modeling/transformer_decoder/
mask2former_transformer_decoder.py:201-382, executed torch-only with a stub
fvcore and spoofed package parents). Exercises the full 3-level round-robin
with masked cross-attention driven by the model's own mask predictions.
`tests/test_mask2former_decoder_parity.py` replays the weights through
models/mask2former_decoder.py WITHOUT torch at runtime.

Usage (one-off, requires torch):
    python tests/golden/generate_mask2former_decoder_golden.py
"""
import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference/downstream/instance_segmentation/modeling"

wi = types.ModuleType("fvcore.nn.weight_init")


def c2_xavier_fill(module):
    torch.nn.init.kaiming_uniform_(module.weight, a=1)
    if module.bias is not None:
        torch.nn.init.constant_(module.bias, 0)


wi.c2_xavier_fill = c2_xavier_fill
fv = types.ModuleType("fvcore")
fvnn = types.ModuleType("fvcore.nn")
fvnn.weight_init = wi
fv.nn = fvnn
sys.modules.setdefault("fvcore", fv)
sys.modules.setdefault("fvcore.nn", fvnn)
sys.modules.setdefault("fvcore.nn.weight_init", wi)


def add_pkg(name, path):
    m = types.ModuleType(name)
    m.__path__ = [path]
    sys.modules[name] = m


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


add_pkg("refm2f", REF)
add_pkg("refm2f.transformer_decoder", f"{REF}/transformer_decoder")
load("refm2f.transformer_decoder.position_encoding",
     f"{REF}/transformer_decoder/position_encoding.py")
m2f = load("refm2f.transformer_decoder.mask2former_transformer_decoder",
           f"{REF}/transformer_decoder/mask2former_transformer_decoder.py")

D, Q, HEADS, FF, LAYERS, K, MD = 32, 5, 4, 64, 3, 3, 16

torch.manual_seed(23)
model = m2f.MultiScaleMaskedTransformerDecoder(
    in_channels=D, num_classes=K, hidden_dim=D, num_queries=Q, nheads=HEADS,
    dim_feedforward=FF, dec_layers=LAYERS, pre_norm=False, mask_dim=MD,
).eval()

rng = np.random.default_rng(20260818)
x = [rng.standard_normal((2, D, s, s)).astype(np.float32) for s in (4, 8, 16)]
mask_features = rng.standard_normal((2, MD, 32, 32)).astype(np.float32)

with torch.no_grad():
    out = model([torch.from_numpy(v) for v in x],
                torch.from_numpy(mask_features))

arrs = {"mask_features": mask_features}
for i, v in enumerate(x):
    arrs[f"x_{i}"] = v
arrs["pred_logits"] = out["pred_logits"].numpy()
arrs["pred_masks"] = out["pred_masks"].numpy()
for i, aux in enumerate(out["aux_outputs"]):
    arrs[f"aux_{i}_logits"] = aux["pred_logits"].numpy()
    arrs[f"aux_{i}_masks"] = aux["pred_masks"].numpy()
for k, v in model.state_dict().items():
    arrs[f"w_{k}"] = v.numpy()

np.savez_compressed("tests/golden/mask2former_decoder_golden.npz", **arrs)
print("wrote tests/golden/mask2former_decoder_golden.npz:", len(arrs),
      "arrays; aux:", len(out["aux_outputs"]))
