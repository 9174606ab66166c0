"""Generate golden parity tensors from the PyTorch reference.

Runs the *reference implementation itself* (read-only) under torch-CPU on
fixed random inputs and freezes inputs/weights/outputs into
``reference_golden.npz``. `tests/test_reference_parity.py` then asserts the
JAX framework reproduces these numbers WITHOUT torch at runtime.

Sources exercised (all under /root/reference; loaded file-by-file with
importlib because the pretraining package __init__ transitively imports
zorro_utils.py, which ships a SyntaxError at line 255):
  * pretraining/multimae/criterion.py:24-172   masked MSE / L1 / CE losses
  * pretraining/multimae/criterion.py:204-335  vicreg / HardNegtive / DINO /
                                               byol / dino_loss_func
  * pretraining/multimae/multimae_utils.py:29-45  build_2d_sincos_posemb
  * downstream/instance_segmentation/modeling/multimae/zorro_utils.py:227-258
    Block (zorro-masked) and Block_Fusion — the syntactically valid copies
  * multimae_crossattn.py:431-447 zorro mask rule (recomputed inline here)

Usage (one-off, requires torch):
    python tests/golden/generate_reference_golden.py
"""
import importlib.util

import numpy as np
import torch

REF = "/root/reference"

# the reference hardcodes .cuda() in HardNegtive_loss (criterion.py:242)
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


criterion = load("ref_criterion", f"{REF}/pretraining/multimae/criterion.py")
mm_utils = load("ref_mm_utils", f"{REF}/pretraining/multimae/multimae_utils.py")
ds_zorro = load(
    "ref_ds_zorro",
    f"{REF}/downstream/instance_segmentation/modeling/multimae/zorro_utils.py",
)

out = {}
rng = np.random.default_rng(20260816)
torch.manual_seed(0)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x)).float()


# ---------------------------------------------------------------- posemb
for h, w, d in [(4, 4, 32), (16, 16, 192)]:
    pe = mm_utils.build_2d_sincos_posemb(h, w, embed_dim=d)  # [1, d, h, w]
    out[f"posemb_{h}x{w}x{d}"] = pe.numpy()

# ---------------------------------------------------------------- masked losses
B, H, W, P = 3, 32, 32, 8
N = (H // P) * (W // P)
mask = np.zeros((B, N), np.float32)
mask[0] = rng.integers(0, 2, N)
mask[1] = 1.0
# sample 2 stays all-zero -> reference nanmean drops it
out["loss_mask"] = mask

pred3 = rng.normal(size=(B, 3, H, W)).astype(np.float32)
tgt3 = rng.normal(size=(B, 3, H, W)).astype(np.float32)
pred1 = rng.normal(size=(B, 1, H, W)).astype(np.float32)
tgt1 = rng.normal(size=(B, 1, H, W)).astype(np.float32)
out["mse_pred"], out["mse_tgt"] = pred3, tgt3
out["l1_pred"], out["l1_tgt"] = pred1, tgt1

mse = criterion.MaskedMSELoss(patch_size=P)
mse_np = criterion.MaskedMSELoss(patch_size=P, norm_pix=True)
l1 = criterion.MaskedL1Loss(patch_size=P)
out["mse_masked"] = mse(t(pred3), t(tgt3), t(mask)).item()
out["mse_unmasked"] = mse(t(pred3), t(tgt3)).item()
out["mse_normpix"] = mse_np(t(pred3), t(tgt3), t(mask)).item()
out["mse_zero_mask"] = mse(t(pred3), t(tgt3), torch.zeros(B, N)).item()
out["l1_masked"] = l1(t(pred1), t(tgt1), t(mask)).item()

K = 9
logits = rng.normal(size=(B, K, H, W)).astype(np.float32)
target = rng.integers(0, K, size=(B, H, W)).astype(np.int64)
out["ce_logits"], out["ce_target"] = logits, target
ce = criterion.MaskedCrossEntropyLoss(patch_size=P)
ce_ls = criterion.MaskedCrossEntropyLoss(patch_size=P, label_smoothing=0.1)
out["ce_masked"] = ce(t(logits), torch.from_numpy(target), t(mask)).item()
out["ce_smoothed"] = ce_ls(t(logits), torch.from_numpy(target), t(mask)).item()

# ---------------------------------------------------------------- contrastive
Bc, Dc = 6, 16
za = rng.normal(size=(Bc, Dc)).astype(np.float32)
zb = rng.normal(size=(Bc, Dc)).astype(np.float32)
out["contra_a"], out["contra_b"] = za, zb
out["vicreg"] = criterion.vicreg(t(za), t(zb)).item()
out["hardneg_hard"] = criterion.HardNegtive_loss(
    tau_plus=0.1, beta=1.0, temperature=0.5, estimator="hard"
)(t(za), t(zb)).item()
out["hardneg_easy"] = criterion.HardNegtive_loss(estimator="easy")(t(za), t(zb)).item()
out["byol_simple"] = criterion.byol_loss_func(t(za), t(zb), simplified=True).item()
out["byol_full"] = criterion.byol_loss_func(t(za), t(zb), simplified=False).item()
out["dino_fn"] = criterion.dino_loss_func(t(za), t(zb)).item()

dino = criterion.DINOLoss(out_dim=Dc)


def _update_center(teacher_output):
    # criterion.py:313 does torch.cat(teacher_output) on a TENSOR, which is a
    # TypeError on any modern torch (DINOLoss is unwired dead code in the
    # reference; its drivers use dino_loss_func). The evident intent is the
    # standard DINO center update over the (normalized) teacher batch:
    with torch.no_grad():
        batch_center = torch.cat([teacher_output]).mean(dim=0, keepdim=True)
        dino.center = dino.center * dino.center_momentum + (
            1 - dino.center_momentum
        ) * batch_center


dino.update_center = _update_center
out["dinoc_loss1"] = dino(t(za), t(zb)).item()
out["dinoc_center1"] = dino.center.numpy().copy()
out["dinoc_loss2"] = dino(t(zb), t(za)).item()
out["dinoc_center2"] = dino.center.numpy().copy()

# ------------------------------------------------- Block / Block_Fusion
DIM, DH, HEADS, FF = 32, 8, 2, 4
torch.manual_seed(1)
blk = ds_zorro.Block(dim=DIM, dim_head=DH, heads=HEADS, ff_mult=FF,
                     norm_layer=ds_zorro.LayerNorm)
blk.eval()

types = np.array([0, 0, 0, 1, 1, 1, 2, 2, 3, 3, 3, 3], np.int64)
# zorro rule, multimae_crossattn.py:431-447: same type OR query is fusion
zmask = (types[:, None] == types[None, :]) | (types[:, None] == 3)
out["block_types"] = types
x = rng.normal(size=(2, len(types), DIM)).astype(np.float32)
out["block_x"] = x
with torch.no_grad():
    out["block_out"] = blk(t(x), torch.from_numpy(zmask)).numpy()
for name, p in blk.state_dict().items():
    out[f"block_w::{name}"] = p.numpy()

torch.manual_seed(2)
fus = ds_zorro.Block_Fusion(dim=DIM, dim_head=DH, heads=HEADS, ff_mult=FF,
                            norm_layer=ds_zorro.LayerNorm)
fus.eval()
stack = rng.normal(size=(2, 5, 4, DIM)).astype(np.float32)
out["fusion_x"] = stack
with torch.no_grad():
    out["fusion_out"] = fus(t(stack), None).numpy()
for name, p in fus.state_dict().items():
    out[f"fusion_w::{name}"] = p.numpy()

np.savez_compressed("tests/golden/reference_golden.npz", **out)
print(f"wrote tests/golden/reference_golden.npz with {len(out)} arrays")
