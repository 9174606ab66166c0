"""One-variant step timing for perf ablation (run one process per variant;
the axon tunnel serializes JAX clients).

Usage: python tools/bench_ablate.py <variant>
variants: full_pallas | full_xla | zorro_pallas | fwd_only | fwd_only_xla
        | no_fused_adamw | no_patch_losses | no_fusion_row | xla_ffn
        | gather_assembly | patch_major (host-emitted [B,N,p*p*C] batches)
(the no_* variants time full_pallas with exactly one round-3 optimization
disabled, so each queued change can be accepted/reverted on its own number)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incomplete_multimodal_fusion_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main(variant: str):
    import dataclasses

    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, ModelConfig, PretrainConfig,
    )
    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
    from incomplete_multimodal_fusion_tpu.ops import masking
    from incomplete_multimodal_fusion_tpu.train import pretrain

    from incomplete_multimodal_fusion_tpu.config import OptimConfig, TrainConfig

    if variant == "no_fusion_row":
        os.environ["IMF_DISABLE_FUSION_ROW"] = "1"
    if variant == "xla_ffn":
        os.environ["IMF_DISABLE_PALLAS_FFN"] = "1"
    attn = "xla" if variant in ("full_xla", "fwd_only_xla") else "pallas"
    fusion = "zorro" if variant == "zorro_pallas" else "crossattn"
    kv = "gather" if variant == "gather_assembly" else "onehot"
    cfg = PretrainConfig(
        model=ModelConfig(fusion_mode=fusion, attn_impl=attn, kv_assembly=kv),
        data=DataConfig(input_size=256, patch_size=16,
                        in_domains=("s1", "s2"), out_domains=("s1", "s2"),
                        batch_size=60),
        mask=MaskConfig(num_encoded_tokens=384),
        optim=OptimConfig(fused_adamw=(variant != "no_fused_adamw")),
        train=TrainConfig(patch_space_losses=(variant != "no_patch_losses")),
    )
    b = cfg.data.batch_size
    model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(0), 1000)
    host_batch = synthetic_batch(
        np.random.default_rng(0), cfg.data.in_domains, b, 256)
    if variant == "patch_major":
        from incomplete_multimodal_fusion_tpu.data import patchify_batch
        host_batch = patchify_batch(host_batch, cfg.data.patch_size)
    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    if variant.startswith("fwd_only"):
        e = cfg.mask.num_encoded_tokens
        mi = masking.generate_random_masks(
            jax.random.PRNGKey(1), tuple(cfg.data.in_domains),
            (256, 256), e, b)
        params = pretrain.cast_tree(state.params, jnp.bfloat16)
        cb = {k: v.astype(jnp.bfloat16) for k, v in batch.items()}

        @jax.jit
        def fn(params, cb):
            out = model.apply({"params": params}, cb, mi, e)
            return out["preds"]["s1"].sum()

        for _ in range(3):
            r = fn(params, cb)
        float(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn(params, cb)
        float(r)
        print(f"{variant}: {(time.perf_counter()-t0)/20*1000:.2f} ms/iter")
        return

    step = jax.jit(pretrain.make_train_step(model, cfg, tx), donate_argnums=0)
    for _ in range(3):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, batch)
    float(m["loss"])
    print(f"{variant}: {(time.perf_counter()-t0)/20*1000:.2f} ms/step")


if __name__ == "__main__":
    main(sys.argv[1])
