"""Transplant parity for the supervised-baseline backbone
(`fusion_mode='sup'`) against the executed reference multimae_sup.py
ViTBaseline (:281-358: full-attention blocks over raw modality tokens,
posemb'd return tokens attention-pooled over the final stream, replicated
into the up1..up4 pyramid). Torch runs at test time (importorskip)."""
import importlib.util
import sys
import types
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from incomplete_multimodal_fusion_tpu.models.vit_baseline import ViTBaseline
from incomplete_multimodal_fusion_tpu.utils import torch_convert as tc

REF = "/root/reference/downstream/instance_segmentation/modeling/multimae"

D, DEPTH, HEADS, DH, IMG, PATCH = 64, 4, 2, 16, 64, 16
F = (IMG // PATCH) ** 2
DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}


def _load():
    def add_pkg(name, path):
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    add_pkg("refsup", REF)
    load("refsup.multimae_utils", f"{REF}/multimae_utils.py")
    load("refsup.zorro_utils", f"{REF}/zorro_utils.py")
    ia = load("refsup.input_adapters", f"{REF}/input_adapters.py")
    sup = load("refsup.multimae_sup", f"{REF}/multimae_sup.py")
    return ia, sup


def test_sup_backbone_golden():
    ia, sup = _load()
    torch.manual_seed(13)
    input_adapters = {
        d: ia.PatchedInputAdapter(num_channels=CHANNELS[d], stride_level=1,
                                  patch_size_full=PATCH, image_size=IMG)
        for d in DOMAINS
    }
    input_adapters["fusion"] = ia.FusionInputAdapter(
        num_channels=D, stride_level=1, patch_size_full=PATCH, image_size=IMG)
    ref = sup.ViTBaseline(  # sup's MultiMAE hardcodes s1/s2/dem (no in_domains)
        pretrained="", input_adapters=input_adapters, output_adapters=None,
        dim_tokens=D, depth=DEPTH, dim_head=DH,
        heads=HEADS, ff_mult=4, num_fusion_tokens=F,
    ).eval()

    rng = np.random.default_rng(7)
    x = {d: rng.standard_normal((2, CHANNELS[d], IMG, IMG)).astype(np.float32)
         for d in DOMAINS}
    with torch.no_grad():
        feats_ref = ref(OrderedDict((d, torch.from_numpy(x[d]))
                                    for d in DOMAINS))

    s = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = {
        "return_tokens": s["return_tokens"],
        "norm": {"gamma": s["norm.gamma"]},
        "attn_pool": tc._zorro_attention(s, "attn_pool"),
        "mlp": tc._mlp(s, "mlp"),
        "pyramid": {
            "up1_conv1": tc._convt(s, "up1.0"),
            "up1_gn": {"scale": s["up1.1.weight"], "bias": s["up1.1.bias"]},
            "up1_conv2": tc._convt(s, "up1.3"),
            "up2_conv": tc._convt(s, "up2"),
        },
    }
    for d in DOMAINS:
        params[f"input_adapter_{d}"] = tc._input_adapter(s, f"input_adapters.{d}")
    for i in range(DEPTH):
        params[f"block{i}"] = tc._encoder_block(s, f"blocks.{i}")
    params = jax.tree.map(jnp.asarray, params)

    model = ViTBaseline(
        in_domains=DOMAINS, image_size=IMG, patch_size=PATCH, dim_tokens=D,
        depth=DEPTH, dim_head=DH, heads=HEADS, num_fusion_tokens=F,
        fusion_mode="sup", attn_impl="xla",
    )
    from incomplete_multimodal_fusion_tpu.ops.masking import full_visible_mask_info

    mi = full_visible_mask_info(DOMAINS, (F,) * 3, 2)
    xj = {d: jnp.asarray(x[d].transpose(0, 2, 3, 1)) for d in DOMAINS}
    feats = model.apply({"params": params}, xj, mi, 3 * F)

    assert len(feats) == 4
    for i, f in enumerate(feats):
        r = feats_ref[i].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(f), r, rtol=3e-4, atol=3e-4,
                                   err_msg=f"pyramid level {i}")
