"""One-off timing of the PyTorch reference pretrain step (CPU).

Anchors the BASELINE.json north star ("≥5x the PyTorch reference per chip"):
the reference publishes no numbers and no GPU is available here, so we record
a same-machine CPU step time for both the reference (torch 2.x CPU) and this
framework (JAX on the CPU backend), plus the TPU number from bench.py. The
CPU/CPU ratio is hardware-neutral evidence of the software-stack speedup; the
TPU/CPU ratio is reported alongside with the hardware caveat stated.

The reference as published CANNOT import: pretraining/multimae/zorro_utils.py
ships a SyntaxError (full-width colon at :255 — SURVEY.md §4). We stage a
copy of the pretraining tree in /tmp and substitute the author's own
syntactically valid downstream copy
(downstream/instance_segmentation/modeling/multimae/zorro_utils.py), which is
the canonical Block_Fusion definition. Nothing is copied into this repo.

Usage:  python tools/bench_reference_torch.py [--batch 8] [--steps 3]
Writes: REFERENCE_TIMING.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
STAGE = "/tmp/ref_timing"


def stage_reference():
    if os.path.exists(STAGE):
        shutil.rmtree(STAGE)
    shutil.copytree(os.path.join(REF, "pretraining"), STAGE)
    # the published pretraining zorro_utils.py is a SyntaxError; the
    # downstream copy is the working definition (SURVEY.md §2.1)
    shutil.copy(
        os.path.join(REF, "downstream/instance_segmentation/modeling/multimae/zorro_utils.py"),
        os.path.join(STAGE, "multimae/zorro_utils.py"),
    )
    sys.path.insert(0, STAGE)


def build_reference_model():
    import torch.nn as nn
    from functools import partial

    from multimae.multimae_crossattn import pretrain_multimae_tiny
    from multimae.zorro_utils import TokenTypes as T
    from multimae.input_adapters import PatchedInputAdapter, FusionInputAdapter
    from multimae.output_adapters_simple import SpatialOutputAdapter

    # the crossattn flagship hardcodes the s1/s2/dem triple in its forward
    # (multimae_crossattn.py:402-415), so the anchor uses the reference's
    # own default config (pretrain_mmae.py: --in_domains s1-s2-dem)
    in_domains = ["s1", "s2", "dem"]
    chans = {"s1": 1, "s2": 3, "dem": 1}
    input_adapters = {
        d: PatchedInputAdapter(
            num_channels=chans[d], stride_level=1, patch_size_full=16, image_size=256
        )
        for d in in_domains
    }
    input_adapters["fusion"] = FusionInputAdapter(
        num_channels=1, stride_level=1, patch_size_full=16, image_size=256
    )
    output_adapters = {
        d: SpatialOutputAdapter(
            num_channels=chans[d], stride_level=1, patch_size_full=16,
            dim_tokens=256, depth=2, num_heads=8, use_task_queries=True,
            task=d, context_tasks=in_domains, use_xattn=True,
        )
        for d in in_domains
    }
    model = pretrain_multimae_tiny(
        input_adapters=input_adapters,
        output_adapters=output_adapters,
        num_global_tokens=1,
        num_fusion_tokens=256,
        return_token_types=(T.S1, T.S2, T.DEM, T.FUSION),
        drop_path_rate=0.0,
    )
    return model, in_domains


def time_reference_torch(batch: int, steps: int) -> dict:
    import torch

    from multimae.criterion import MaskedL1Loss, MaskedMSELoss, dino_loss_func

    torch.manual_seed(0)
    model, in_domains = build_reference_model()
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    losses = {
        "s1": MaskedMSELoss(patch_size=16, stride=1),
        "s2": MaskedMSELoss(patch_size=16, stride=1),
        "dem": MaskedL1Loss(patch_size=16, stride=1),  # DOMAIN_CONF :65-70
    }

    x = {
        "s1": torch.randn(batch, 1, 256, 256),
        "s2": torch.randn(batch, 3, 256, 256),
        "dem": torch.randn(batch, 1, 256, 256),
    }

    def one_step():
        # mirrors pretrain_mmae.py:466-500 (no autocast: CPU)
        preds, masks, pooled, ori, fus, s1_t, s2_t, dem_t = model(
            x, num_encoded_tokens=384, alphas=1.0
        )
        task_losses = {
            t: losses[t](preds[t].float(), x[t], mask=masks.get(t)) for t in preds
        }
        s1_f, s2_f, dsm_f, fusion_f = torch.chunk(pooled, 4, dim=1)
        loss_contra = (
            dino_loss_func(s1_t.squeeze(), s1_f.squeeze())
            + dino_loss_func(s2_t.squeeze(), s2_f.squeeze())
            + dino_loss_func(dem_t.squeeze(), dsm_f.squeeze())
        )
        loss = sum(task_losses.values()) + 0.3 * loss_contra
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return {
        "step_s": dt,
        "patches_per_sec": batch * 768 / dt,
        "batch": batch,
        "threads": __import__("torch").get_num_threads(),
    }


def time_ours_jax_cpu(batch: int, steps: int) -> dict:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
    )
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig,
    )
    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
    from incomplete_multimodal_fusion_tpu.train import pretrain

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cfg = PretrainConfig(
            data=DataConfig(input_size=256, patch_size=16,
                            in_domains=("s1", "s2", "dem"),
                            out_domains=("s1", "s2", "dem"),
                            batch_size=batch),
            mask=MaskConfig(num_encoded_tokens=384),
        )
        model, state, tx = pretrain.create_train_state(
            cfg, jax.random.PRNGKey(0), total_steps=1000
        )
        step = jax.jit(pretrain.make_train_step(model, cfg, tx), donate_argnums=0)
        data = {
            k: jnp.asarray(v) for k, v in synthetic_batch(
                np.random.default_rng(0), cfg.data.in_domains, batch, 256
            ).items()
        }
        state, m = step(state, data)
        float(m["loss"])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, data)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / steps
    return {"step_s": dt, "patches_per_sec": batch * 768 / dt, "batch": batch}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="batch for the CPU/CPU comparison (the reference "
                    "default 60 is impractically slow on CPU; both sides use "
                    "the same batch so the ratio holds)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--skip_jax", action="store_true")
    args = ap.parse_args()

    stage_reference()
    print("timing PyTorch reference (CPU)...", flush=True)
    ref = time_reference_torch(args.batch, args.steps)
    print(f"  reference: {ref['step_s']*1e3:.0f} ms/step, "
          f"{ref['patches_per_sec']:.0f} patches/s", flush=True)

    out = {
        "config": "s1+s2+dem tiny 192d/12L, 256^2, patch 16, 384 encoded tokens, "
                  "simple output adapters, AdamW, fp32 (no CUDA autocast on CPU)",
        "hardware": "same-host CPU for both stacks",
        "torch_reference_cpu": ref,
        "note": "reference zorro_utils.py SyntaxError patched with the "
                "author's downstream copy; see tools/bench_reference_torch.py",
    }
    if not args.skip_jax:
        print("timing this framework (JAX CPU backend)...", flush=True)
        ours = time_ours_jax_cpu(args.batch, args.steps)
        print(f"  ours(cpu): {ours['step_s']*1e3:.0f} ms/step, "
              f"{ours['patches_per_sec']:.0f} patches/s", flush=True)
        out["ours_jax_cpu"] = ours
        out["cpu_speedup_ours_vs_reference"] = round(
            ref["step_s"] / ours["step_s"], 3
        )

    path = os.path.join(REPO, "REFERENCE_TIMING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
