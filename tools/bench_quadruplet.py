"""Quadruplet-path TPU bench (round-4 verdict Do#7): the 4-modality
s1-s2-dem-dnw pretrain configuration — N = 4*256 visible candidates + 256
fusion = up to 1280 packed tokens, the q-tiled flash attention kernel's
real consumer (reference pretrain_mmae_my.py defaults: batch 20, 256
encoded tokens) — with a same-session A/B against the headline s1+s2
config.

Writes the `quadruplet_pretrain` record into BENCH_EXTRA.json.

Usage: python tools/bench_quadruplet.py [--steps 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from incomplete_multimodal_fusion_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(cfg, n_steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
    from incomplete_multimodal_fusion_tpu.train import pretrain

    model, state, tx = pretrain.create_train_state(
        cfg, jax.random.PRNGKey(0), total_steps=1000)
    step = jax.jit(pretrain.make_train_step(model, cfg, tx), donate_argnums=0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        np.random.default_rng(0), cfg.data.in_domains, cfg.data.batch_size,
        cfg.data.input_size).items()}
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    b = cfg.data.batch_size
    pps = cfg.data.num_patches * len(cfg.data.in_domains)
    return {
        "ms_per_step": round(dt * 1e3, 2),
        "patches_per_sec_per_chip": round(b * pps / dt, 1),
        "batch": b,
        "packed_tokens": cfg.mask.num_encoded_tokens
                         + cfg.model.num_fusion_tokens,
        "loss_finite": bool(np.isfinite(loss)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig,
    )

    # reference quadruplet defaults (pretrain_mmae_my.py): 4 modalities,
    # batch 20, 256 encoded tokens; dnw rides the SemSeg adapter
    quad = PretrainConfig(
        data=DataConfig(input_size=256, patch_size=16,
                        in_domains=("s1", "s2", "dem", "dnw"),
                        out_domains=("s1", "s2", "dem", "dnw"),
                        batch_size=20),
        mask=MaskConfig(num_encoded_tokens=256),
    )
    # headline s1+s2 config for the same-session anchor
    pair = PretrainConfig(
        data=DataConfig(input_size=256, patch_size=16,
                        in_domains=("s1", "s2"), out_domains=("s1", "s2"),
                        batch_size=60),
        mask=MaskConfig(num_encoded_tokens=384),
    )
    res_q = measure(quad, args.steps)
    res_p = measure(pair, args.steps)
    rec = {
        "metric": "quadruplet_pretrain",
        "value": res_q["patches_per_sec_per_chip"],
        "unit": "patches/sec/chip (s1-s2-dem-dnw, batch 20, e=256, "
                "flash-attention path; same-session s1+s2 anchor attached)",
        "quadruplet": res_q,
        "s1s2_anchor": res_p,
    }
    print(json.dumps(rec), flush=True)
    path = os.path.join(ROOT, "BENCH_EXTRA.json")
    extra = {}
    if os.path.exists(path):
        with open(path) as f:
            extra = json.load(f)
    extra["quadruplet_pretrain"] = rec
    with open(path, "w") as f:
        json.dump(extra, f, indent=2)


if __name__ == "__main__":
    main()
