"""Freeze golden tensors from the reference MSDeformAttnPixelDecoder
(downstream/instance_segmentation/modeling/pixel_decoder/msdeformattn.py:166-
311 + ops/modules/ms_deform_attn.py pytorch core — executed torch-only with a
stub fvcore.nn.weight_init and spoofed package parents for the relative
imports). `tests/test_pixel_decoder_parity.py` replays the weights through
models/pixel_decoder.py WITHOUT torch at runtime.

Usage (one-off, requires torch):
    python tests/golden/generate_pixel_decoder_golden.py
"""
import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference/downstream/instance_segmentation/modeling"

# ---- stub fvcore.nn.weight_init (absent in this env) ----------------------
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
sys.modules["fvcore"] = fv
sys.modules["fvcore.nn"] = fvnn
sys.modules["fvcore.nn.weight_init"] = wi


# ---- spoof the package tree so relative imports resolve -------------------
def add_pkg(name, path=None):
    m = types.ModuleType(name)
    m.__path__ = [path] if path else []
    sys.modules[name] = m
    return m


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


add_pkg("refmodeling", REF)
add_pkg("refmodeling.transformer_decoder", f"{REF}/transformer_decoder")
add_pkg("refmodeling.pixel_decoder", f"{REF}/pixel_decoder")
add_pkg("refmodeling.pixel_decoder.ops", f"{REF}/pixel_decoder/ops")
add_pkg("refmodeling.pixel_decoder.ops.functions",
        f"{REF}/pixel_decoder/ops/functions")
add_pkg("refmodeling.pixel_decoder.ops.modules",
        f"{REF}/pixel_decoder/ops/modules")

load("refmodeling.transformer_decoder.position_encoding",
     f"{REF}/transformer_decoder/position_encoding.py")
load("refmodeling.transformer_decoder.transformer",
     f"{REF}/transformer_decoder/transformer.py")
load("refmodeling.pixel_decoder.ops.functions.ms_deform_attn_func",
     f"{REF}/pixel_decoder/ops/functions/ms_deform_attn_func.py")
msda_mod = load("refmodeling.pixel_decoder.ops.modules.ms_deform_attn",
                f"{REF}/pixel_decoder/ops/modules/ms_deform_attn.py")
# the modules/__init__ re-exports MSDeformAttn; mimic it
sys.modules["refmodeling.pixel_decoder.ops.modules"].MSDeformAttn = (
    msda_mod.MSDeformAttn)
pd = load("refmodeling.pixel_decoder.msdeformattn",
          f"{REF}/pixel_decoder/msdeformattn.py")


class Shape:
    def __init__(self, channel, stride):
        self.channel, self.stride = channel, stride


CONV = 32
CHANNELS = {"res2": 8, "res3": 16, "res4": 24, "res5": 40}
SIZES = {"res2": 32, "res3": 16, "res4": 8, "res5": 4}
input_shape = {
    "res2": Shape(8, 4), "res3": Shape(16, 8),
    "res4": Shape(24, 16), "res5": Shape(40, 32),
}

torch.manual_seed(11)
model = pd.MSDeformAttnPixelDecoder(
    input_shape,
    transformer_dropout=0.0,
    transformer_nheads=8,
    transformer_dim_feedforward=64,
    transformer_enc_layers=1,
    conv_dim=CONV,
    mask_dim=CONV,
    transformer_in_features=["res3", "res4", "res5"],
    common_stride=4,
).eval()

rng = np.random.default_rng(20260818)
feats_np = {
    k: rng.standard_normal((2, CHANNELS[k], SIZES[k], SIZES[k])).astype(np.float32)
    for k in CHANNELS
}
with torch.no_grad():
    mask_features, out0, ms_feats = model.forward_features(
        {k: torch.from_numpy(v) for k, v in feats_np.items()}
    )

out = {}
for k, v in feats_np.items():
    out[f"x_{k}"] = v
out["mask_features"] = mask_features.numpy()
out["out0"] = out0.numpy()
for i, f in enumerate(ms_feats):
    out[f"ms_{i}"] = f.numpy()
for k, v in model.state_dict().items():
    out[f"w_{k}"] = v.numpy()

np.savez_compressed("tests/golden/pixel_decoder_golden.npz", **out)
print("wrote tests/golden/pixel_decoder_golden.npz:", len(out), "arrays;",
      "ms levels:", len(ms_feats), [tuple(f.shape) for f in ms_feats])
