"""Parity tests for ops/pallas_fusion_attn.py — fused fusion-row slot
attention (FusionBlockFast's sim/softmax/mix without the KV transposes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops.pallas_fusion_attn import (
    fusion_row_attention,
    fusion_row_attention_xla,
    fusion_row_supported,
)


@pytest.mark.parametrize("b,f,t,h,dh", [(2, 32, 3, 2, 16), (1, 64, 2, 4, 8),
                                        (3, 16, 4, 1, 32)])
def test_forward_matches_xla(b, f, t, h, dh):
    rng = np.random.default_rng(f + t)
    inner = h * dh
    q = jnp.asarray(rng.standard_normal((b, f, inner)), jnp.float32)
    kvg = jnp.asarray(rng.standard_normal((b, t * f, 2 * inner)), jnp.float32)
    kvf = jnp.asarray(rng.standard_normal((b, f, 2 * inner)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fusion_row_attention(q, kvg, kvf, h, dh)),
        np.asarray(fusion_row_attention_xla(q, kvg, kvf, h, dh)), atol=2e-6)


def test_grads_match_xla():
    rng = np.random.default_rng(0)
    b, f, t, h, dh = 2, 32, 3, 2, 16
    inner = h * dh
    q = jnp.asarray(rng.standard_normal((b, f, inner)), jnp.float32)
    kvg = jnp.asarray(rng.standard_normal((b, t * f, 2 * inner)), jnp.float32)
    kvf = jnp.asarray(rng.standard_normal((b, f, 2 * inner)), jnp.float32)

    def loss(fn, args):
        return jnp.sum(jnp.sin(fn(*args, h, dh)))

    g1 = jax.grad(lambda a: loss(fusion_row_attention, a))((q, kvg, kvf))
    g2 = jax.grad(lambda a: loss(fusion_row_attention_xla, a))((q, kvg, kvf))
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_supported_gate():
    assert fusion_row_supported(256, 2, 192)   # flagship s1+s2
    assert fusion_row_supported(256, 3, 192)   # 3-modality
    assert not fusion_row_supported(250, 2, 192)  # rows not 8-aligned
    assert not fusion_row_supported(4096, 8, 512)  # VMEM bound


def test_fusion_block_fast_routes_and_matches():
    """FusionBlockFast(use_pallas=True) must equal its XLA path bitwise-ish
    (interpret mode on CPU pins the full wired path incl. the einsum-grid
    assembly upstream of the kernel)."""
    from incomplete_multimodal_fusion_tpu.models.layers import FusionBlockFast

    rng = np.random.default_rng(1)
    b, e, fdim, t, d = 2, 24, 16, 2, 32
    blk = FusionBlockFast(dim_head=8, heads=2, ff_mult=2)
    packed = jnp.asarray(rng.standard_normal((b, e, d)), jnp.float32)
    fusion = jnp.asarray(rng.standard_normal((b, fdim, d)), jnp.float32)
    mask_emb = jnp.asarray(rng.standard_normal((1, fdim, d)), jnp.float32)
    slot = rng.integers(0, e, size=(b, t * fdim))
    onehot = jnp.asarray(
        (slot[..., None] == np.arange(e)), jnp.float32)
    use = jnp.asarray(rng.random((b, t * fdim)) > 0.3)
    params = blk.init(jax.random.PRNGKey(0), packed, fusion, mask_emb,
                      onehot, use)["params"]
    y_x = blk.apply({"params": params}, packed, fusion, mask_emb, onehot,
                    use, use_pallas=False)
    y_p = blk.apply({"params": params}, packed, fusion, mask_emb, onehot,
                    use, use_pallas=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=3e-6)

    def loss(p, up):
        y = blk.apply({"params": p}, packed, fusion, mask_emb, onehot, use,
                      use_pallas=up)
        return jnp.sum(y * jnp.cos(0.01 * jnp.arange(y.size).reshape(y.shape)))

    g_x = jax.grad(lambda p: loss(p, False))(params)
    g_p = jax.grad(lambda p: loss(p, True))(params)

    def check(path, a, b_):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5,
                                   err_msg=str(path))

    jax.tree_util.tree_map_with_path(check, g_x, g_p)
