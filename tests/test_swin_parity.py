"""models/swin.py SwinBlock parity vs the vendored reference Swin
(downstream/instance_segmentation/modeling/backbone/swin.py), weights
transplanted from the executed torch block. Covers plain windows, shifted
windows with the cross-boundary mask, and the shifted+padded path.
Fixture: tests/golden/generate_swin_golden.py.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.swin import (
    SwinBlock, relative_position_index,
)

G = dict(np.load(
    os.path.join(os.path.dirname(__file__), "golden", "swin_golden.npz")
))
DIM, HEADS, WINDOW = 32, 2, 7


def k(w):
    return jnp.asarray(w.T)


@pytest.fixture(scope="module")
def params():
    W = {kk[len("w::"):]: v for kk, v in G.items() if kk.startswith("w::")}
    return {
        "norm1": {"gamma": jnp.asarray(W["norm1.weight"]),
                  "beta": jnp.asarray(W["norm1.bias"])},
        "attn": {
            "qkv": {"kernel": k(W["attn.qkv.weight"]),
                    "bias": jnp.asarray(W["attn.qkv.bias"])},
            "proj": {"kernel": k(W["attn.proj.weight"]),
                     "bias": jnp.asarray(W["attn.proj.bias"])},
            "relative_position_bias_table": jnp.asarray(
                W["attn.relative_position_bias_table"]),
        },
        "norm2": {"gamma": jnp.asarray(W["norm2.weight"]),
                  "beta": jnp.asarray(W["norm2.bias"])},
        "mlp": {
            "fc1": {"kernel": k(W["mlp.fc1.weight"]),
                    "bias": jnp.asarray(W["mlp.fc1.bias"])},
            "fc2": {"kernel": k(W["mlp.fc2.weight"]),
                    "bias": jnp.asarray(W["mlp.fc2.bias"])},
        },
    }


def test_relative_position_index_matches_reference():
    mine = relative_position_index(WINDOW, WINDOW)
    np.testing.assert_array_equal(mine, G["rel_index"])


@pytest.mark.parametrize("tag,h,w,shift", [
    ("plain", 14, 14, 0),
    ("shift", 14, 14, 3),
    ("shift_pad", 10, 10, 3),
])
def test_swin_block_matches_reference(params, tag, h, w, shift):
    blk = SwinBlock(dim=DIM, num_heads=HEADS, window=WINDOW, shift=shift)
    x = jnp.asarray(G[f"{tag}::x"].reshape(2, h, w, DIM))
    y = blk.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(y).reshape(2, h * w, DIM), G[f"{tag}::y"], atol=2e-5,
        err_msg=tag,
    )
