"""Freeze a FULL-MODEL forward of the PyTorch reference MultiMAE.

Round-2 verdict Missing #2: end-to-end forward parity with transplanted
reference weights. This script re-assembles the reference flagship
(pretraining/multimae/multimae_crossattn.py:331-545 — crossattn fusion, the
path pretrain_mmae.py drives) at a structurally-complete small config, runs
it under torch-CPU on fixed inputs with explicit task masks, and freezes
EVERY weight plus all eight forward outputs into ``fullmodel_golden.npz``.
`tests/test_fullmodel_parity.py` then transplants the weights through
``utils/torch_convert.py`` and asserts the JAX forward matches at fp32
tolerance — no torch at runtime.

The pretraining zorro_utils.py ships a SyntaxError (full-width colon,
zorro_utils.py:255), so the syntactically valid downstream copy
(downstream/instance_segmentation/modeling/multimae/zorro_utils.py) is
preloaded under the package name before importing multimae_crossattn —
exactly the per-block golden generator's approach, extended to the whole
model.

Two cases are frozen:
  * "full":    all three modalities present, 24 of 48 tokens visible
  * "drop":    dem fully masked (the infer_mmae.py:344-361 ablation path),
               24 of 32 s1+s2 tokens visible

Usage (one-off, requires torch):
    python tests/golden/generate_fullmodel_golden.py
"""
import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference"

# ---- assemble a 'refmm' package whose zorro_utils is the valid downstream copy
pkg = types.ModuleType("refmm")
pkg.__path__ = [f"{REF}/pretraining/multimae"]
sys.modules["refmm"] = pkg


def load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


load("refmm.zorro_utils",
     f"{REF}/downstream/instance_segmentation/modeling/multimae/zorro_utils.py")
load("refmm.multimae_utils", f"{REF}/pretraining/multimae/multimae_utils.py")
ia = load("refmm.input_adapters", f"{REF}/pretraining/multimae/input_adapters.py")
oa = load("refmm.output_adapters_simple",
          f"{REF}/pretraining/multimae/output_adapters_simple.py")
mm = load("refmm.multimae_crossattn",
          f"{REF}/pretraining/multimae/multimae_crossattn.py")

# ---- fixture config: structurally complete, small enough for a test fixture
IMG, PATCH = 64, 16
NP_MOD = (IMG // PATCH) ** 2  # 16 patches per modality
DIM, DEPTH, DIM_HEAD, HEADS, FF = 64, 2, 16, 2, 4
DEC_DIM, DEC_DEPTH, DEC_HEADS = 32, 2, 2
E = 24  # num_encoded_tokens
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
DOMAINS = ("s1", "s2", "dem")

torch.manual_seed(20260817)
input_adapters = {
    d: ia.PatchedInputAdapter(
        num_channels=CHANNELS[d], stride_level=1, patch_size_full=PATCH,
        image_size=IMG,
    )
    for d in DOMAINS
}
input_adapters["fusion"] = ia.FusionInputAdapter(
    num_channels=1, stride_level=1, patch_size_full=PATCH, image_size=IMG
)
output_adapters = {
    d: oa.SpatialOutputAdapter(
        num_channels=CHANNELS[d], stride_level=1, patch_size_full=PATCH,
        image_size=IMG, dim_tokens=DEC_DIM, depth=DEC_DEPTH,
        num_heads=DEC_HEADS, use_task_queries=True, task=d,
        context_tasks=list(DOMAINS), use_xattn=True,
    )
    for d in DOMAINS
}
model = mm.MultiMAE(
    input_adapters=input_adapters,
    output_adapters=output_adapters,
    num_global_tokens=1,
    dim_tokens=DIM,
    depth=DEPTH,
    dim_head=DIM_HEAD,
    heads=HEADS,
    ff_mult=FF,
    num_fusion_tokens=NP_MOD,
    return_token_types=(
        mm.TokenTypes.S1, mm.TokenTypes.S2, mm.TokenTypes.DEM,
        mm.TokenTypes.FUSION,
    ),
    drop_path_rate=0.0,
    norm_layer=mm.LayerNorm,
)
model.eval()

out = {}
for name, p in model.state_dict().items():
    out[f"w::{name}"] = p.numpy()

rng = np.random.default_rng(7)
B = 2
x = {
    d: rng.normal(size=(B, CHANNELS[d], IMG, IMG)).astype(np.float32)
    for d in DOMAINS
}
for d in DOMAINS:
    out[f"x_{d}"] = x[d]


def run_case(tag: str, visible: dict):
    """visible: {domain: np bool [NP_MOD]} — True = visible; total must be E."""
    task_masks = {
        d: torch.from_numpy((~visible[d]).astype(np.int64))[None].repeat(B, 1)
        for d in DOMAINS
    }
    assert int(sum(v.sum() for v in visible.values())) == E
    with torch.no_grad():
        preds, tm, ret, ori, fus, r_s1, r_s2, r_dem = model.forward(
            {d: torch.from_numpy(x[d]) for d in DOMAINS},
            mask_inputs=True,
            task_masks=task_masks,
            num_encoded_tokens=E,
        )
    for d in DOMAINS:
        out[f"{tag}::mask_{d}"] = task_masks[d].numpy()
        out[f"{tag}::pred_{d}"] = preds[d].numpy()
    out[f"{tag}::return_tokens"] = ret.numpy()
    out[f"{tag}::ori_tokens"] = ori.numpy()
    out[f"{tag}::fusion_tokens"] = fus.numpy()
    out[f"{tag}::pool_s1"] = r_s1.numpy()
    out[f"{tag}::pool_s2"] = r_s2.numpy()
    out[f"{tag}::pool_dem"] = r_dem.numpy()


# case 1: all modalities partially visible (10 + 8 + 6 = 24)
vis = {d: np.zeros(NP_MOD, bool) for d in DOMAINS}
vis["s1"][rng.permutation(NP_MOD)[:10]] = True
vis["s2"][rng.permutation(NP_MOD)[:8]] = True
vis["dem"][rng.permutation(NP_MOD)[:6]] = True
run_case("full", vis)

# case 2: dem completely dropped (infer ablation), 12 + 12 visible
vis = {d: np.zeros(NP_MOD, bool) for d in DOMAINS}
vis["s1"][rng.permutation(NP_MOD)[:12]] = True
vis["s2"][rng.permutation(NP_MOD)[:12]] = True
run_case("drop", vis)

np.savez_compressed("tests/golden/fullmodel_golden.npz", **out)
print(f"wrote tests/golden/fullmodel_golden.npz with {len(out)} arrays")
