"""One-off timing of the PyTorch reference DOWNSTREAM MaskFormer step (CPU).

Round-2 verdict Missing #5: the 87.5 imgs/s TPU downstream number
(BENCH_EXTRA.json) had no reference-side counterpart. This executes ONE
training step of the reference instance-segmentation stack —
MaskFormerModel_vit (incomplete-fusion ViT backbone + MSDeformAttn pixel
decoder + Mask2Former decoder) + SetCriterion/HungarianMatcher with the
published ake150 config values, mirroring
maskformer_train_ins_vit.py:185-239 (loss = 0.3*ce + 0.3*dice + 0.4*mask,
AdamW) — under torch-CPU, and merges the timing into REFERENCE_TIMING.json.

Environment shims (none of these change reference behavior):
  * addict.Dict / fvcore.nn.weight_init / torchvision are absent here —
    minimal stand-ins are registered (the reference only touches
    cfg attribute access, c2_xavier_fill, and an unused torchvision import
    in utils/misc.py).
  * matcher_ins.py imports detectron2's point_sample (matcher_ins.py:12)
    even though the author's own copy exists at utils/point_features.py:4-27
    — the detectron2 name is aliased to that local copy.

Usage:  python tools/bench_reference_downstream_torch.py [--batch 2] [--steps 2]
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import math
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/downstream/instance_segmentation"


def install_shims():
    import torch
    import torch.nn as nn

    # ---- addict.Dict: attribute-access dict (recursive)
    class ADict(dict):
        def __getattr__(self, k):
            if k.startswith("__"):
                raise AttributeError(k)
            if k not in self:
                self[k] = ADict()  # auto-vivify like addict
            return self[k]

        def __setattr__(self, k, v):
            self[k] = v

    addict = types.ModuleType("addict")
    addict.Dict = ADict
    sys.modules["addict"] = addict

    # ---- fvcore.nn.weight_init (c2_xavier_fill / c2_msra_fill)
    fv = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")
    wi = types.ModuleType("fvcore.nn.weight_init")

    def c2_xavier_fill(m):
        nn.init.kaiming_uniform_(m.weight, a=1)
        if m.bias is not None:
            nn.init.constant_(m.bias, 0)

    def c2_msra_fill(m):
        nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
        if m.bias is not None:
            nn.init.constant_(m.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    wi.c2_msra_fill = c2_msra_fill
    fvnn.weight_init = wi
    fv.nn = fvnn
    sys.modules["fvcore"] = fv
    sys.modules["fvcore.nn"] = fvnn
    sys.modules["fvcore.nn.weight_init"] = wi

    # ---- torchvision: imported by utils/misc.py but unused on this path
    tv = types.ModuleType("torchvision")
    tv._is_tracing = lambda: False  # misc.py:87 guard
    tv.ops = types.ModuleType("torchvision.ops")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops

    # ---- detectron2 point_sample -> the reference's own local copy
    pf_spec = importlib.util.spec_from_file_location(
        "_ref_point_features", f"{REF}/utils/point_features.py")
    pf = importlib.util.module_from_spec(pf_spec)
    pf_spec.loader.exec_module(pf)
    d2 = types.ModuleType("detectron2")
    d2p = types.ModuleType("detectron2.projects")
    d2pr = types.ModuleType("detectron2.projects.point_rend")
    d2pf = types.ModuleType("detectron2.projects.point_rend.point_features")
    d2pf.point_sample = pf.point_sample
    d2pr.point_features = d2pf
    d2p.point_rend = d2pr
    d2.projects = d2p
    for name, mod in [("detectron2", d2), ("detectron2.projects", d2p),
                      ("detectron2.projects.point_rend", d2pr),
                      ("detectron2.projects.point_rend.point_features", d2pf)]:
        sys.modules[name] = mod


def load_reference():
    """File-by-file package assembly (the utils/__init__ pulls pycocotools
    which is absent; modeling/__init__ pulls the unused CNN MaskFormerModel)."""

    def pkg(name, path):
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m
        return m

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    def pkg_with_init(name, path):
        # packages whose __init__.py carries re-exports (ops.modules does
        # `from .ms_deform_attn import MSDeformAttn`)
        spec = importlib.util.spec_from_file_location(
            name, f"{path}/__init__.py", submodule_search_locations=[path])
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # bare pkgs skip __init__ (refds.utils pulls pycocotools; refds.modeling
    # pulls the unused CNN MaskFormerModel)
    pkg("refds", REF)
    pkg("refds.modeling", f"{REF}/modeling")
    pkg("refds.modeling.multimae", f"{REF}/modeling/multimae")
    pkg("refds.modeling.pixel_decoder", f"{REF}/modeling/pixel_decoder")
    pkg("refds.modeling.pixel_decoder.ops", f"{REF}/modeling/pixel_decoder/ops")
    pkg("refds.modeling.pixel_decoder.ops.functions",
        f"{REF}/modeling/pixel_decoder/ops/functions")
    pkg_with_init("refds.modeling.pixel_decoder.ops.modules",
                  f"{REF}/modeling/pixel_decoder/ops/modules")
    pkg("refds.modeling.transformer_decoder",
        f"{REF}/modeling/transformer_decoder")
    pkg("refds.utils", f"{REF}/utils")

    mm_vit = load("refds.modeling.MaskFormerModel_vit",
                  f"{REF}/modeling/MaskFormerModel_vit.py")
    crit = load("refds.utils.criterion_ins", f"{REF}/utils/criterion_ins.py")
    matcher = load("refds.utils.matcher_ins", f"{REF}/utils/matcher_ins.py")
    return mm_vit, crit, matcher


def build_cfg():
    """The published ake150 config values (configs/maskformer_ake150.yaml +
    Base-segmention.yaml) as an attribute dict."""
    from addict import Dict

    cfg = Dict()
    cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 4
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 2
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 256
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 256
    cfg.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES = [
        "res3", "res4", "res5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 1
    cfg.MODEL.MASK_FORMER.DROPOUT = 0.0
    cfg.MODEL.MASK_FORMER.NHEADS = 8
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 256
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 100
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 2048
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 3
    cfg.MODEL.MASK_FORMER.PRE_NORM = False
    cfg.MODEL.MASK_FORMER.NO_OBJECT_WEIGHT = 0.1
    cfg.MODEL.MASK_FORMER.CLASS_WEIGHT = 2.0
    cfg.MODEL.MASK_FORMER.MASK_WEIGHT = 5.0
    cfg.MODEL.MASK_FORMER.DICE_WEIGHT = 5.0
    cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS = 12544
    cfg.MODEL.MASK_FORMER.OVERSAMPLE_RATIO = 3.0
    cfg.MODEL.MASK_FORMER.IMPORTANCE_SAMPLE_RATIO = 0.75
    cfg.MODEL.BACKBONE.PRETRAINED_WEIGHTS = ""
    cfg.MultiMAE.patch_size = 16
    cfg.MultiMAE.input_size = 256
    cfg.MultiMAE.in_domains = ["s1", "s2", "dem"]
    cfg.MultiMAE.drop_path = 0.0
    cfg.MultiMAE.extra_fusion_token = True
    return cfg


def time_downstream(batch: int, steps: int) -> dict:
    import torch

    install_shims()
    mm_vit, crit, matcher_mod = load_reference()
    cfg = build_cfg()

    torch.manual_seed(0)
    model = mm_vit.MaskFormerModel(cfg)
    model.train()
    device = torch.device("cpu")
    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=12544)
    weight_dict = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0}
    for i in range(cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1):
        weight_dict.update(
            {f"loss_ce_{i}": 2.0, f"loss_mask_{i}": 5.0, f"loss_dice_{i}": 5.0})
    criterion = crit.SetCriterion(
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES, matcher=matcher,
        weight_dict=weight_dict, eos_coef=0.1, losses=["labels", "masks"],
        num_points=12544, oversample_ratio=3.0, importance_sample_ratio=0.75,
        device=device,
    )
    opt = torch.optim.AdamW(
        filter(lambda p: p.requires_grad, model.parameters()), 1e-4)

    rng = torch.Generator().manual_seed(1)
    inputs = {
        "s1": torch.randn(batch, 1, 256, 256, generator=rng),
        "s2": torch.randn(batch, 3, 256, 256, generator=rng),
        "dem": torch.randn(batch, 1, 256, 256, generator=rng),
    }
    # 2 synthetic instances per image (square blobs), like bench.py's
    # downstream case
    targets = []
    for b in range(batch):
        masks = torch.zeros(2, 256, 256, dtype=torch.bool)
        masks[0, 40:120, 40:120] = True
        masks[1, 150:230, 100:220] = True
        targets.append({
            "labels": torch.zeros(2, dtype=torch.int64),
            "masks": masks,
        })

    def one_step():
        outputs = model(inputs)
        losses = criterion(outputs, targets)
        loss_ce = loss_dice = loss_mask = 0.0
        for k in list(losses.keys()):
            if k in weight_dict:
                losses[k] = losses[k] * weight_dict[k]
                if "_ce" in k:
                    loss_ce = loss_ce + losses[k]
                elif "_dice" in k:
                    loss_dice = loss_dice + losses[k]
                else:
                    loss_mask = loss_mask + losses[k]
        loss = 0.3 * loss_ce + 0.3 * loss_dice + 0.4 * loss_mask
        model.zero_grad()
        criterion.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    loss0 = one_step()  # warmup
    assert math.isfinite(loss0), loss0
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return {
        "step_s": dt,
        "imgs_per_sec": batch / dt,
        "batch": batch,
        "threads": torch.get_num_threads(),
        "loss_warmup": loss0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2,
                    help="the reference default 30 is impractical on CPU; "
                    "imgs/s scales sublinearly so this favors the reference")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    print("timing PyTorch reference downstream MaskFormer step (CPU)...",
          flush=True)
    res = time_downstream(args.batch, args.steps)
    print(f"  reference downstream: {res['step_s']*1e3:.0f} ms/step, "
          f"{res['imgs_per_sec']:.2f} imgs/s", flush=True)

    path = os.path.join(REPO, "REFERENCE_TIMING.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["torch_reference_downstream_cpu"] = {
        **res,
        "config": "MaskFormerModel_vit (tiny-192 incomplete-fusion ViT + "
                  "MSDeformAttn pixel decoder + Mask2Former decoder, ake150 "
                  "yaml values), SetCriterion 0.3ce/0.3dice/0.4mask, AdamW, "
                  "2 instances/img, fp32 CPU",
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")
    print(f"merged into {path}")


if __name__ == "__main__":
    main()
