"""Parity tests for the fused small-N attention kernel (interpret mode on
CPU) against ops.attention.multihead_attention — the same role ops/test.py
plays for the reference's CUDA kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops.attention import multihead_attention
from incomplete_multimodal_fusion_tpu.ops.pallas_small_attn import (
    small_attention,
    small_attention_supported,
)


def _ref(q, k, v, h, dh):
    b, n, inner = q.shape
    hs = lambda t: t.reshape(b, n, h, dh)
    return multihead_attention(hs(q), hs(k), hs(v)).reshape(b, n, inner)


@pytest.mark.parametrize("n,h,dh", [(64, 4, 32), (128, 2, 64), (256, 8, 32)])
def test_forward_matches_xla(n, h, dh):
    rng = np.random.default_rng(n + h)
    b, inner = 2, h * dh
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, inner)), jnp.float32)
               for _ in range(3))
    np.testing.assert_allclose(
        np.asarray(small_attention(q, k, v, h, dh)),
        np.asarray(_ref(q, k, v, h, dh)), atol=2e-5)


def test_grads_match_xla():
    rng = np.random.default_rng(0)
    b, n, h, dh = 2, 64, 4, 32
    inner = h * dh
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, inner)), jnp.float32)
               for _ in range(3))
    g1 = jax.grad(lambda a: jnp.sum(small_attention(*a, h, dh) ** 2))((q, k, v))
    g2 = jax.grad(lambda a: jnp.sum(_ref(*a, h, dh) ** 2))((q, k, v))
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=5e-4)


def test_supported_gate():
    assert small_attention_supported(256, 256, 32)      # the decoder shape
    assert not small_attention_supported(250, 256, 32)  # rows not 8-aligned
    assert not small_attention_supported(256, 192, 32)  # lanes not 128-mult
    assert not small_attention_supported(2048, 256, 32) # sim too large


def test_decoder_block_routes_and_matches():
    """ViTSelfAttention(use_pallas=True) must equal the XLA path (on CPU the
    kernel runs in interpret mode, so this pins the full wired path)."""
    from incomplete_multimodal_fusion_tpu.models.layers import ViTSelfAttention

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    m = ViTSelfAttention(num_heads=4, qkv_bias=True)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    o_xla = m.apply({"params": params}, x, use_pallas=False)
    o_pl = m.apply({"params": params}, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_xla), atol=2e-5)


def test_fused_qkv_matches_split():
    """small_attention_qkv over the fused [B,N,3I] slab must equal the
    split-operand kernel and the XLA reference (values AND the one-slab
    dqkv gradient)."""
    from incomplete_multimodal_fusion_tpu.ops.pallas_small_attn import (
        small_attention_qkv,
    )

    rng = np.random.default_rng(3)
    b, n, h, dh = 2, 64, 4, 32
    inner = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    np.testing.assert_allclose(
        np.asarray(small_attention_qkv(qkv, h, dh)),
        np.asarray(_ref(q, k, v, h, dh)), atol=2e-5)

    g1 = jax.grad(lambda a: jnp.sum(small_attention_qkv(a, h, dh) ** 2))(qkv)
    g2 = jax.grad(
        lambda a: jnp.sum(_ref(*jnp.split(a, 3, axis=-1), h, dh) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=5e-4)
