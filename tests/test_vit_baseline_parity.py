"""Golden parity for models/vit_baseline.py against the executed reference
downstream ViTBaseline (multimae_big_imcomplete.py:418-683; tensors frozen by
generate_vit_baseline_golden.py — no torch at runtime). One transplant drives
the full backbone: input adapters, the interleaved fusion/zorro block stack,
all 4 fusion-stream taps, and the up1..up4 pyramid."""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from incomplete_multimodal_fusion_tpu.models.vit_baseline import ViTBaseline
from incomplete_multimodal_fusion_tpu.ops.masking import full_visible_mask_info
from incomplete_multimodal_fusion_tpu.utils import torch_convert as tc

GOLDEN = pathlib.Path(__file__).parent / "golden" / "vit_baseline_golden.npz"

D, DEPTH, HEADS, DH, IMG, PATCH = 64, 4, 2, 16, 64, 16
F = (IMG // PATCH) ** 2
DOMAINS = ("s1", "s2", "dem")


def _convt(w, prefix):
    # torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out],
    # SPATIALLY FLIPPED: torch scatters weight[i, j] to output[p*s+i, q*s+j]
    # while flax/lax.conv_transpose evaluates a fractionally-strided conv
    # with the unflipped kernel — for s == k the two differ by a spatial flip
    return {"kernel": w[f"{prefix}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1],
            "bias": w[f"{prefix}.bias"]}


def test_vit_baseline_golden():
    g = np.load(GOLDEN)
    w = {k[len("w_"):]: g[k] for k in g.files if k.startswith("w_")}

    params = {
        "fusion_tokens": w["fusion_tokens"],
        "mask_embedding": w["mask_embedding"],
        "norm": {"gamma": w["norm.gamma"]},
        "pyramid": {
            "up1_conv1": _convt(w, "up1.0"),
            "up1_gn": {"scale": w["up1.1.weight"], "bias": w["up1.1.bias"]},
            "up1_conv2": _convt(w, "up1.3"),
            "up2_conv": _convt(w, "up2"),
        },
    }
    for d in DOMAINS:
        params[f"input_adapter_{d}"] = tc._input_adapter(w, f"input_adapters.{d}")
    for i in range(DEPTH):
        params[f"block{i}"] = tc._encoder_block(w, f"blocks.{i}")
        params[f"fus_block{i}"] = tc._fusion_block(w, f"fus_blocks.{i}")
    params = jax.tree.map(jnp.asarray, params)

    x = {d: jnp.asarray(g[f"x_{d}"].transpose(0, 2, 3, 1)) for d in DOMAINS}
    b = 2
    e = 3 * F  # all tokens visible (reference eval path, :575-580)
    mi = full_visible_mask_info(DOMAINS, (F,) * 3, b)

    model = ViTBaseline(
        in_domains=DOMAINS, image_size=IMG, patch_size=PATCH, dim_tokens=D,
        depth=DEPTH, dim_head=DH, heads=HEADS, num_fusion_tokens=F,
        attn_impl="xla",
    )
    feats = model.apply({"params": params}, x, mi, e)

    assert len(feats) == 4
    for i, f in enumerate(feats):
        ref = g[f"f_{i}"].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(f), ref, rtol=3e-4, atol=3e-4)
