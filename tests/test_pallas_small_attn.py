"""Parity tests for the fused small-N attention kernel (interpret mode on
CPU) against ops.attention.multihead_attention — the same role ops/test.py
plays for the reference's CUDA kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops.attention import multihead_attention
from incomplete_multimodal_fusion_tpu.ops.pallas_small_attn import (
    small_attention_qkv,
    small_attention_qkv_auto,
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
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    np.testing.assert_allclose(
        np.asarray(small_attention_qkv(qkv, h, dh)),
        np.asarray(_ref(q, k, v, h, dh)), atol=2e-5)


def test_grads_match_xla():
    """One-slab dqkv gradient vs the XLA reference."""
    rng = np.random.default_rng(3)
    b, n, h, dh = 2, 64, 4, 32
    inner = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.float32)
    g1 = jax.grad(lambda a: jnp.sum(small_attention_qkv(a, h, dh) ** 2))(qkv)
    g2 = jax.grad(
        lambda a: jnp.sum(_ref(*jnp.split(a, 3, axis=-1), h, dh) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=5e-4)


def test_supported_gate():
    assert small_attention_supported(256, 256, 32)      # the decoder shape
    assert not small_attention_supported(250, 256, 32)  # rows not 8-aligned
    assert not small_attention_supported(256, 192, 32)  # lanes not 128-mult
    assert not small_attention_supported(2048, 256, 32) # sim too large


def test_auto_wrapper_resolves_to_xla_on_cpu():
    """'auto' must lower to the XLA path off-TPU (no interpret-mode kernel,
    no Mosaic call in a CPU executable) and match numerically."""
    rng = np.random.default_rng(5)
    b, n, h, dh = 2, 64, 4, 32
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * dh)), jnp.float32)
    out = jax.jit(lambda a: small_attention_qkv_auto(a, h, dh))(qkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v, h, dh)),
                               atol=2e-5)


@pytest.mark.parametrize("mode", [True, "auto"])
def test_decoder_block_routes_and_matches(mode):
    """ViTSelfAttention(use_pallas=True|'auto') must equal the XLA path (on
    CPU: True runs the kernel in interpret mode, 'auto' resolves to XLA at
    lowering time — both pin the full wired path)."""
    from incomplete_multimodal_fusion_tpu.models.layers import ViTSelfAttention

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    m = ViTSelfAttention(num_heads=4, qkv_bias=True)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    o_xla = m.apply({"params": params}, x, use_pallas=False)
    o_pl = m.apply({"params": params}, x, use_pallas=mode)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_xla), atol=2e-5)
