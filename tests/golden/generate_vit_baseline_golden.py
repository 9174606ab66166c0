"""Freeze golden tensors from the reference downstream ViTBaseline backbone
(downstream/instance_segmentation/modeling/multimae/multimae_big_imcomplete.py
:418-683 — the syntactically valid downstream copy; torch+einops only).

Eval-mode forward (all modalities present, all tokens visible) through the
full fusion/zorro block stack, the 4 fusion-stream taps, and the up1..up4
feature pyramid. `tests/test_vit_baseline_parity.py` replays the weights
through models/vit_baseline.py WITHOUT torch at runtime.

Usage (one-off, requires torch):
    python tests/golden/generate_vit_baseline_golden.py
"""
import importlib.util
import sys
import types
from collections import OrderedDict

import numpy as np
import torch

REF = "/root/reference/downstream/instance_segmentation/modeling/multimae"


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


add_pkg("refmm", REF)
load("refmm.multimae_utils", f"{REF}/multimae_utils.py")
load("refmm.zorro_utils", f"{REF}/zorro_utils.py")
ia = load("refmm.input_adapters", f"{REF}/input_adapters.py")
big = load("refmm.multimae_big_imcomplete", f"{REF}/multimae_big_imcomplete.py")

D, DEPTH, HEADS, DH, IMG, PATCH = 64, 4, 2, 16, 64, 16
F = (IMG // PATCH) ** 2  # 16 fusion tokens == num_patches
DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}

torch.manual_seed(31)
input_adapters = {
    d: ia.PatchedInputAdapter(num_channels=CHANNELS[d], stride_level=1,
                              patch_size_full=PATCH, image_size=IMG)
    for d in DOMAINS
}
input_adapters["fusion"] = ia.FusionInputAdapter(
    num_channels=D, stride_level=1, patch_size_full=PATCH, image_size=IMG)

model = big.ViTBaseline(
    pretrained="",  # no checkpoint; os.path.exists('') is False
    input_adapters=input_adapters,
    output_adapters=None,
    in_domains=list(DOMAINS),
    dim_tokens=D, depth=DEPTH, dim_head=DH, heads=HEADS, ff_mult=4,
    num_fusion_tokens=F,
).eval()

rng = np.random.default_rng(20260818)
x = {d: rng.standard_normal((2, CHANNELS[d], IMG, IMG)).astype(np.float32)
     for d in DOMAINS}
with torch.no_grad():
    feats = model(OrderedDict((d, torch.from_numpy(x[d])) for d in DOMAINS))

arrs = {}
for d in DOMAINS:
    arrs[f"x_{d}"] = x[d]
for i, f in enumerate(feats):
    arrs[f"f_{i}"] = f.numpy()
for k, v in model.state_dict().items():
    arrs[f"w_{k}"] = v.numpy()

np.savez_compressed("tests/golden/vit_baseline_golden.npz", **arrs)
print("wrote tests/golden/vit_baseline_golden.npz:", len(arrs), "arrays;",
      [tuple(f.shape) for f in feats])
