"""fusion_mode='crossattn_v1' parity vs the executed 20231203 snapshot.

Round-2 verdict Weak #6. Weights are synthesized deterministically per
state-dict key (the dim-768 hardcode in the snapshot's scatter makes real
weight storage ~160 MB) — per-key checksums frozen by the generator verify
both sides built identical tensors. Mask is the quirk-neutral contiguous
layout; see tests/golden/generate_crossattn_v1_golden.py for why that makes
the published snapshot's row-pairing / grid-index-pool quirks coincide with
this rebuild's intent semantics.
"""
import os
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.multimae import MultiMAE
from incomplete_multimodal_fusion_tpu.ops import masking
from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
    convert_multimae_state,
)

G = dict(np.load(
    os.path.join(os.path.dirname(__file__), "golden", "crossattn_v1_golden.npz")
))
DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
E = 16


def synth_weight(key: str, shape) -> np.ndarray:
    """MUST stay in sync with generate_crossattn_v1_golden.py."""
    seed = zlib.crc32(key.encode())
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


@pytest.fixture(scope="module")
def model_and_params():
    keys = [str(k) for k in G["wsum::keys"]]
    shapes = [tuple(int(v) for v in s.split(",")) for s in G["wsum::shapes"]]
    sums = np.asarray(G["wsum::vals"])
    state = {}
    for k, shape, ref_sum in zip(keys, shapes, sums):
        w = synth_weight(k, shape)
        # checksum guard: the generator and this test built the same tensor
        np.testing.assert_allclose(np.float64(w).sum(), ref_sum, rtol=1e-10,
                                   err_msg=f"weight synthesis drift at {k}")
        state[k] = w
    params = convert_multimae_state(
        state, DOMAINS, DOMAINS, CHANNELS, patch_size=16, depth=1,
        decoder_depth=1, fusion_mode="crossattn_v1",
    )
    model = MultiMAE(
        in_domains=DOMAINS, out_domains=DOMAINS, image_size=64, patch_size=16,
        dim_tokens=768, depth=1, dim_head=64, heads=8, ff_mult=4,
        num_fusion_tokens=16, fusion_mode="crossattn_v1", attn_impl="xla",
        decoder_dim=32, decoder_depth=1, decoder_num_heads=2,
    )
    return model, params


@pytest.mark.slow
def test_crossattn_v1_forward_parity(model_and_params):
    model, params = model_and_params
    x = {d: jnp.asarray(G[f"x_{d}"].transpose(0, 2, 3, 1)) for d in DOMAINS}
    tm = {d: jnp.asarray(G[f"mask_{d}"]) for d in DOMAINS}
    mi = masking.mask_info_from_task_masks(tm, DOMAINS, E)
    out = model.apply({"params": params}, x, mi, E)

    for d in DOMAINS:
        np.testing.assert_allclose(
            np.asarray(out["preds"][d]),
            G[f"pred_{d}"].transpose(0, 2, 3, 1), atol=3e-5,
            err_msg=f"pred[{d}]",
        )
    np.testing.assert_allclose(np.asarray(out["pooled"]), G["return_tokens"],
                               atol=3e-5, err_msg="return_tokens")
    np.testing.assert_allclose(np.asarray(out["ori_tokens"]),
                               G["ori_tokens"], atol=3e-5, err_msg="ori")
    for d in DOMAINS:
        np.testing.assert_allclose(
            np.asarray(out["pooled_mod"][d]), G[f"pool_{d}"][:, 0, :],
            atol=3e-5, err_msg=f"pool[{d}]",
        )
