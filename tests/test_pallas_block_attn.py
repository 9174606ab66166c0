"""Parity tests for ops/pallas_block_attn.py — the fused encoder attention
half-block kernel (norm1 + attn-norm + q/kv proj + zorro attention + out
proj + residual in one Pallas program per batch row).

The kernel is an opt-in path (EncoderBlock.fused_block; measured slower
than the XLA composition at the flagship shape on v5e-1 but kept for
traffic-dominated shapes), so it keeps a full value+grad parity test
against both the pure-XLA reference composition and the unfused
EncoderBlock path (checkpoint-layout compatibility included).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.layers import EncoderBlock
from incomplete_multimodal_fusion_tpu.ops.pallas_attn import PAD_TYPE
from incomplete_multimodal_fusion_tpu.ops.pallas_block_attn import (
    block_attn_supported,
    fused_block_attn,
    fused_block_attn_xla,
)

B, N, D, H, DH = 2, 64, 32, 2, 16
FUSION = 2


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    types = jnp.asarray(rng.integers(0, 3, size=(B, N)), jnp.int32)
    types = types.at[:, -5:].set(PAD_TYPE)
    return x, types


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(1)
    inner = H * DH
    return (
        jnp.asarray(rng.normal(size=(1, D)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(1, D)) * 0.1 + 1.0, jnp.float32),
        jnp.asarray(rng.normal(size=(D, inner)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(D, 2 * inner)) * 0.05, jnp.float32),
        jnp.asarray(rng.normal(size=(inner, D)) * 0.05, jnp.float32),
    )


def test_supported_gate():
    assert block_attn_supported(640, 192, 192)
    assert not block_attn_supported(1024, 192, 192)  # slab bound
    assert not block_attn_supported(636, 192, 192)  # n % 8


def test_forward_matches_xla(data, weights):
    x, types = data
    y_k = fused_block_attn(x, types, *weights, H, FUSION)
    y_x = fused_block_attn_xla(x, types, *weights, H, FUSION)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), atol=2e-6)


def test_grads_match_xla(data, weights):
    x, types = data

    def loss(fn, x, ws):
        y = fn(x, types, *ws, H, FUSION)
        return jnp.sum(y * jnp.sin(0.01 * jnp.arange(y.size).reshape(y.shape)))

    gk = jax.grad(lambda x, ws: loss(fused_block_attn, x, ws), argnums=(0, 1))(
        x, weights)
    gx = jax.grad(lambda x, ws: loss(fused_block_attn_xla, x, ws), argnums=(0, 1))(
        x, weights)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_encoder_block_fused_path_matches_unfused(data):
    """fused_block=True must be numerically identical to the composed path
    AND restore from the same checkpoint layout."""
    x, types = data
    blk = EncoderBlock(dim_head=DH, heads=H, ff_mult=2)
    blk_fused = EncoderBlock(dim_head=DH, heads=H, ff_mult=2, fused_block=True)
    params = blk.init(jax.random.PRNGKey(0), x, packed_types=types,
                      fusion_type=FUSION)["params"]
    p2 = blk_fused.init(jax.random.PRNGKey(0), x, packed_types=types,
                        fusion_type=FUSION, use_pallas=True)["params"]
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, p2)

    y_ref = blk.apply({"params": params}, x, packed_types=types,
                      fusion_type=FUSION, use_pallas=False)
    y_fused = blk_fused.apply({"params": params}, x, packed_types=types,
                              fusion_type=FUSION, use_pallas=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=3e-6)

    def loss(mod, p, up):
        y = mod.apply({"params": p}, x, packed_types=types, fusion_type=FUSION,
                      use_pallas=up)
        return jnp.sum(y * jnp.cos(0.01 * jnp.arange(y.size).reshape(y.shape)))

    g_ref = jax.grad(lambda p: loss(blk, p, False))(params)
    g_fused = jax.grad(lambda p: loss(blk_fused, p, True))(params)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=str(path))

    jax.tree_util.tree_map_with_path(check, g_ref, g_fused)
