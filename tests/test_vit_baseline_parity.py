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


def test_vit_baseline_golden():
    g = np.load(GOLDEN)
    w = {k[len("w_"):]: g[k] for k in g.files if k.startswith("w_")}

    # the library converter (MIGRATION.md path) IS the mapping under test
    params = tc.convert_vit_baseline_state(w, DOMAINS, depth=DEPTH)
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
