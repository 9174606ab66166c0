"""Benchmark: S1+S2 MultiMAE pretrain step throughput (patches/sec/chip).

Mirrors the reference two-modality pretraining configuration
(pretrain_mmae.py defaults: tiny 192d/12L encoder, 256^2 inputs, patch 16,
384 encoded tokens, 256 fusion tokens, batch 60/chip; BASELINE.json metric
"S1+S2 MultiMAE pretrain patches/sec/chip").

The reference publishes no benchmark numbers (BASELINE.md: `published: {}`),
so `vs_baseline` is reported against a frozen round-1 self-baseline stored in
BENCH_BASELINE.json — later rounds show speedup over this round's number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def main():
    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig,
    )
    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
    from incomplete_multimodal_fusion_tpu.train import pretrain

    cfg = PretrainConfig(
        data=DataConfig(
            input_size=256, patch_size=16,
            in_domains=("s1", "s2"), out_domains=("s1", "s2"),
            batch_size=60,
        ),
        mask=MaskConfig(num_encoded_tokens=384),
    )
    b = cfg.data.batch_size
    patches_per_sample = cfg.data.num_patches * len(cfg.data.in_domains)  # 512

    model, state, tx = pretrain.create_train_state(
        cfg, jax.random.PRNGKey(0), total_steps=1000
    )
    step = jax.jit(pretrain.make_train_step(model, cfg, tx), donate_argnums=0)

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.default_rng(0), cfg.data.in_domains, b, cfg.data.input_size
        ).items()
    }

    # warmup / compile; float() forces a device->host transfer, a hard sync
    # (block_until_ready alone can return early through the remote tunnel)
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    patches_per_sec = steps_per_sec * b * patches_per_sample

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("patches_per_sec_per_chip")
        if base:
            vs_baseline = patches_per_sec / base
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "patches_per_sec_per_chip": patches_per_sec,
                    "note": "round-1 self-baseline; reference publishes no numbers",
                },
                f,
            )

    print(json.dumps({
        "metric": "s1s2_multimae_pretrain_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
