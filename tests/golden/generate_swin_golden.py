"""Golden fixture for models/swin.py vs the vendored reference Swin.

Round-2 verdict Weak #6: the compact NHWC Swin rewrite had no
reference-numerics check. This executes the reference SwinTransformerBlock
(downstream/instance_segmentation/modeling/backbone/swin.py:172-295 — the
682-LoC vendored official implementation) under torch-CPU and freezes
weights + outputs for three cases:

  * plain window attention (shift 0, H=W=14 — two full windows per axis)
  * shifted windows with the cross-boundary attention mask (shift 3)
  * shifted + PADDED input (H=W=10 -> padded to 14, the BasicLayer mask
    built over the padded grid, swin.py:404-447)

timm is absent in this environment; the reference only needs DropPath /
to_2tuple / trunc_normal_ from it, shimmed minimally here.

Usage (one-off, requires torch):
    python tests/golden/generate_swin_golden.py
"""
import importlib.util
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"

# ---- minimal timm shim (reference imports DropPath/to_2tuple/trunc_normal_)
timm = types.ModuleType("timm")
timm_models = types.ModuleType("timm.models")
timm_layers = types.ModuleType("timm.models.layers")


class _DropPath(nn.Module):
    def __init__(self, p=0.0):
        super().__init__()

    def forward(self, x):
        return x


def _to_2tuple(v):
    return v if isinstance(v, tuple) else (v, v)


def _trunc_normal_(t, std=0.02, **kw):
    with torch.no_grad():
        t.normal_(0, std).clamp_(-2 * std, 2 * std)
    return t


timm_layers.DropPath = _DropPath
timm_layers.to_2tuple = _to_2tuple
timm_layers.trunc_normal_ = _trunc_normal_
sys.modules["timm"] = timm
sys.modules["timm.models"] = timm_models
sys.modules["timm.models.layers"] = timm_layers

spec = importlib.util.spec_from_file_location(
    "ref_swin",
    f"{REF}/downstream/instance_segmentation/modeling/backbone/swin.py",
)
ref_swin = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref_swin)

DIM, HEADS, WINDOW = 32, 2, 7
out = {}
rng = np.random.default_rng(20260817)

torch.manual_seed(5)
blk = ref_swin.SwinTransformerBlock(
    dim=DIM, num_heads=HEADS, window_size=WINDOW, shift_size=0,
    mlp_ratio=4.0, qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
)
blk.eval()
for name, p in blk.state_dict().items():
    out[f"w::{name}"] = p.numpy()


def basic_layer_mask(hp, wp, w, shift):
    """Attention mask exactly as BasicLayer.forward builds it
    (swin.py:404-447)."""
    img_mask = torch.zeros((1, hp, wp, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = ref_swin.window_partition(img_mask, w).view(-1, w * w)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)


def run(tag, h, w, shift):
    x = rng.normal(size=(2, h * w, DIM)).astype(np.float32)
    out[f"{tag}::x"] = x
    blk.shift_size = shift
    blk.H, blk.W = h, w
    hp = int(np.ceil(h / WINDOW)) * WINDOW
    wp = int(np.ceil(w / WINDOW)) * WINDOW
    mask = basic_layer_mask(hp, wp, WINDOW, shift) if shift > 0 else None
    with torch.no_grad():
        y = blk(torch.from_numpy(x), mask)
    out[f"{tag}::y"] = y.numpy()


run("plain", 14, 14, 0)
run("shift", 14, 14, 3)
run("shift_pad", 10, 10, 3)

# the relative-position index buffer, to pin my numpy reconstruction
out["rel_index"] = blk.attn.relative_position_index.numpy()

np.savez_compressed("tests/golden/swin_golden.npz", **out)
print(f"wrote tests/golden/swin_golden.npz with {len(out)} arrays")
