"""Golden fixture for fusion_mode='crossattn_v1' vs the executed snapshot.

Round-2 verdict Weak #6: the dated 20231203 dev snapshot
(pretraining/multimae/multimae_crossattn_20231203.py) had no
reference-numerics check. This executes the snapshot itself under torch-CPU
and freezes inputs + outputs for `tests/test_crossattn_v1_parity.py`.

Execution constraints of the published snapshot (all verified here):
  * its scatter hardcodes width 768 (`.repeat(B, 1, 768)`, :461-463) — the
    model only runs at dim_tokens=768;
  * its per-layer cross-attention pairs query row j with context row j
    (b*n batch folding, :457-470), which only shapes up when
    num_encoded_tokens == num_fusion_tokens == sum(visible).
  * weights are NOT stored in the fixture (dim-768 params are ~160 MB);
    both sides fill them deterministically from numpy, keyed by state-dict
    path — per-key checksums in the npz guard against drift.

The mask is chosen QUIRK-NEUTRAL: visible indices are contiguous
non-overlapping grid blocks (s1: 0-5, s2: 6-10, dem: 11-15), making
cat(s1_idx, s2_idx, dem_idx) == arange(16). Under that mask the snapshot's
two index quirks — query/context paired by row rather than by grid position,
and contrastive pools indexing the PACKED fusion stream by GRID index
(:509, :540-553) — coincide exactly with the intent semantics the TPU
rebuild implements for arbitrary masks, so the whole forward is comparable.

Usage (one-off, requires torch):
    python tests/golden/generate_crossattn_v1_golden.py
"""
import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference"

pkg = types.ModuleType("refmm")
pkg.__path__ = [f"{REF}/pretraining/multimae"]
sys.modules["refmm"] = pkg


def load(name, path):
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
mm = load("refmm.multimae_crossattn_20231203",
          f"{REF}/pretraining/multimae/multimae_crossattn_20231203.py")

IMG, PATCH, DIM = 64, 16, 768  # DIM=768: hardcoded in the snapshot's scatter
N_P = (IMG // PATCH) ** 2
DEPTH, DIM_HEAD, HEADS, FF = 1, 64, 8, 4
DEC_DIM, DEC_DEPTH, DEC_HEADS = 32, 1, 2
E = N_P  # the snapshot's executability constraint: e == F == sum(visible)
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
DOMAINS = ("s1", "s2", "dem")


def synth_weight(key: str, shape) -> np.ndarray:
    """Deterministic per-key weight synthesis — MUST stay in sync with
    tests/test_crossattn_v1_parity.py (per-key checksums enforce it)."""
    import zlib

    seed = zlib.crc32(key.encode())  # stable across processes
    rng = np.random.default_rng(20260817 + seed)
    if key.endswith((".gamma",)) or key.endswith("norm1.weight") or \
            key.endswith("norm2.weight") or key.endswith("norm.weight"):
        return (1.0 + 0.05 * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith(".beta"):
        # zorro LayerNorm's beta is a zeros BUFFER (zorro_utils.py:103-110),
        # present in state_dict but never trained — must stay zero
        return np.zeros(shape, np.float32)
    if key.endswith(".bias"):
        return (0.02 * rng.standard_normal(shape)).astype(np.float32)
    return (0.05 * rng.standard_normal(shape)).astype(np.float32)


torch.manual_seed(0)
input_adapters = {
    d: ia.PatchedInputAdapter(num_channels=CHANNELS[d], stride_level=1,
                              patch_size_full=PATCH, image_size=IMG)
    for d in DOMAINS
}
input_adapters["fusion"] = ia.FusionInputAdapter(
    num_channels=1, stride_level=1, patch_size_full=PATCH, image_size=IMG)
output_adapters = {
    d: oa.SpatialOutputAdapter(
        num_channels=CHANNELS[d], stride_level=1, patch_size_full=PATCH,
        image_size=IMG, dim_tokens=DEC_DIM, depth=DEC_DEPTH,
        num_heads=DEC_HEADS, use_task_queries=True, task=d,
        context_tasks=list(DOMAINS), use_xattn=True)
    for d in DOMAINS
}
model = mm.MultiMAE(
    input_adapters=input_adapters, output_adapters=output_adapters,
    num_global_tokens=1, dim_tokens=DIM, depth=DEPTH, dim_head=DIM_HEAD,
    heads=HEADS, ff_mult=FF, num_fusion_tokens=N_P,
    return_token_types=(mm.TokenTypes.S1, mm.TokenTypes.S2, mm.TokenTypes.DEM,
                        mm.TokenTypes.FUSION),
    drop_path_rate=0.0, norm_layer=mm.LayerNorm,
)
model.eval()

# overwrite every weight deterministically from numpy; keep fixed (sincos)
# pos_emb buffers as constructed
sd = model.state_dict()
new_sd, sums = {}, {}
for k, v in sd.items():
    if k.endswith("pos_emb"):
        new_sd[k] = v
        continue
    w = synth_weight(k, tuple(v.shape))
    new_sd[k] = torch.from_numpy(w)
    sums[k] = float(np.float64(w).sum())
model.load_state_dict(new_sd)

out = {}
out["wsum::keys"] = np.array(sorted(sums.keys()))
out["wsum::vals"] = np.array([sums[k] for k in sorted(sums.keys())])
out["wsum::shapes"] = np.array(
    [",".join(map(str, sd[k].shape)) for k in sorted(sums.keys())])

rng = np.random.default_rng(11)
B = 2
x = {d: rng.normal(size=(B, CHANNELS[d], IMG, IMG)).astype(np.float32)
     for d in DOMAINS}
for d in DOMAINS:
    out[f"x_{d}"] = x[d]

# quirk-neutral mask: contiguous non-overlapping visible blocks
vis = {"s1": range(0, 6), "s2": range(6, 11), "dem": range(11, 16)}
task_masks = {}
for d in DOMAINS:
    m = np.ones(N_P, np.int64)
    m[list(vis[d])] = 0
    task_masks[d] = torch.from_numpy(m)[None].repeat(B, 1)
    out[f"mask_{d}"] = task_masks[d].numpy()

with torch.no_grad():
    preds, tm, ret, ori, fus, r_s1, r_s2, r_dem = model.forward(
        {d: torch.from_numpy(x[d]) for d in DOMAINS},
        mask_inputs=True, task_masks=task_masks, num_encoded_tokens=E,
    )
for d in DOMAINS:
    out[f"pred_{d}"] = preds[d].numpy()
out["return_tokens"] = ret.numpy()
out["ori_tokens"] = ori.numpy()
out["fusion_tokens"] = fus.numpy()
out["pool_s1"] = r_s1.numpy()
out["pool_s2"] = r_s2.numpy()
out["pool_dem"] = r_dem.numpy()

np.savez_compressed("tests/golden/crossattn_v1_golden.npz", **out)
print(f"wrote tests/golden/crossattn_v1_golden.npz with {len(out)} arrays")
