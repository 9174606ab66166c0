"""Transformer building blocks (flax.linen).

Semantics match the reference zorro utilities
(downstream/instance_segmentation/modeling/multimae/zorro_utils.py — the
syntactically valid copy; the pretraining copy ships a SyntaxError at
zorro_utils.py:255) and the ViT primitives in
pretraining/multimae/multimae_utils.py. Quirks preserved deliberately:

  * ``ZorroAttention`` layer-norms its *query* input internally
    (zorro_utils.py:176), so Block applies LayerNorm twice before attention
    (zorro_utils.py:238). Context/keys are NOT normed when cross-attending.
  * ``GEGLUFeedForward`` also begins with its own LayerNorm
    (zorro_utils.py:121-128) — double-norm again inside Block.
  * Bias-less LayerNorm: learned gamma only, beta fixed at zero
    (zorro_utils.py:103-110).
  * GELU is the exact (erf) variant, like torch F.gelu default.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multihead_attention


def xavier_uniform_fused(n_split: int) -> Callable:
    """Xavier-uniform treating a fused projection (e.g. packed KV) as
    ``n_split`` separate matrices (reference multimae_crossattn.py:141-150)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        val = math.sqrt(6.0 / float(fan_out / n_split + fan_in))
        return jax.random.uniform(key, shape, dtype, -val, val)

    return init


class BiaslessLayerNorm(nn.Module):
    """LayerNorm with learned scale only (zorro_utils.py:103-110)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * gamma).astype(x.dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm with bias (torch nn.LayerNorm parity)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(x.dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class _DenseParams(nn.Module):
    """kernel+bias param holder with nn.Dense-compatible paths/init."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_uniform(),
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (multimae_utils.py:138-155; dropout elided, p=0).

    On TPU with ``use_pallas`` the pair of matmuls + GELU runs as one fused
    Pallas kernel (ops/pallas_ffn.mlp_ffn) — the [M, hidden] activation never
    round-trips HBM. Param paths (fc1/kernel, fc1/bias, ...) unchanged.
    """

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, use_pallas=False):
        from ..ops.pallas_ffn import mlp_ffn, mlp_ffn_auto, mlp_supported

        dim = x.shape[-1]
        hidden = self.hidden_features or dim
        out = self.out_features or dim
        k1, b1 = _DenseParams(dim, hidden, name="fc1")()
        k2, b2 = _DenseParams(hidden, out, name="fc2")()

        m = 1
        for s in x.shape[:-1]:
            m *= s
        if use_pallas and mlp_supported(m, hidden, dim, x.dtype.itemsize):
            fn = mlp_ffn_auto if use_pallas == "auto" else mlp_ffn
            y = fn(x.reshape(m, dim), k1.astype(x.dtype),
                   b1[None].astype(x.dtype), k2.astype(x.dtype),
                   b2[None].astype(x.dtype))
            return y.reshape(*x.shape[:-1], out)

        x = x @ k1.astype(x.dtype) + b1.astype(x.dtype)
        x = gelu(x)
        return x @ k2.astype(x.dtype) + b2.astype(x.dtype)


class _Param(nn.Module):
    """Single-parameter holder used to keep checkpoint paths identical while
    the math runs in a fused kernel (e.g. ``norm/gamma`` without invoking
    BiaslessLayerNorm)."""

    pname: str
    shape: tuple
    init: Callable

    @nn.compact
    def __call__(self):
        return self.param(self.pname, self.init, self.shape)


class GEGLUFeedForward(nn.Module):
    """LayerNorm -> Dense(2*inner, no bias) -> GEGLU -> Dense(dim, no bias)
    with inner = int(dim * mult * 2/3) (zorro_utils.py:115-128).

    The whole FF runs as one fused Pallas kernel on TPU (``use_pallas``
    True/'auto'): the [M, 2*inner] activation never round-trips HBM. Param
    paths (norm/gamma, proj_in/kernel, proj_out/kernel) are unchanged, so
    checkpoints interchange with the unfused layout.
    """

    mult: int = 4

    @nn.compact
    def __call__(self, x, use_pallas=False):
        from ..ops.pallas_ffn import ffn_supported, geglu_ffn, geglu_ffn_auto

        dim = x.shape[-1]
        inner = int(dim * self.mult * 2 / 3)
        gamma = _Param(pname="gamma", shape=(dim,),
                       init=nn.initializers.ones, name="norm")()
        k_in = _Param(pname="kernel", shape=(dim, inner * 2),
                      init=nn.initializers.xavier_uniform(), name="proj_in")()
        k_out = _Param(pname="kernel", shape=(inner, dim),
                       init=nn.initializers.xavier_uniform(), name="proj_out")()

        m = 1
        for s in x.shape[:-1]:
            m *= s
        if use_pallas and ffn_supported(m, dim, inner, x.dtype.itemsize):
            x2 = x.reshape(m, dim)
            fn = geglu_ffn_auto if use_pallas == "auto" else geglu_ffn
            # gamma stays at param precision — the kernel's norm runs in f32
            # and the unfused fallback applies the f32 gamma, so quantizing
            # it to the activation dtype here would open a parity gap
            y = fn(x2, gamma[None], k_in.astype(x.dtype), k_out.astype(x.dtype))
            return y.reshape(x.shape)

        # unfused fallback on the same raw params (BiaslessLayerNorm math)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
              * gamma.astype(jnp.float32)).astype(x.dtype)
        h = xn @ k_in.astype(x.dtype)
        val, gate = jnp.split(h, 2, axis=-1)
        h = gelu(gate) * val
        return h @ k_out.astype(x.dtype)


class ZorroAttention(nn.Module):
    """Masked MHA with internal query-side LayerNorm (zorro_utils.py:152-194).

    q/kv/out projections are bias-free; heads*dim_head may differ from dim.
    Self-attention with ``packed_types`` dispatches to the fused Pallas
    zorro kernel when ``use_pallas``; otherwise the mask is built in XLA.
    """

    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, x, context=None, attn_mask=None, packed_types=None,
                 fusion_type=None, use_pallas=False, fusion_tail=0,
                 empty_rows_uniform_over=None):
        from ..ops.attention import zorro_mask_from_padded_types
        from ..ops.pallas_attn import (
            PAD_TYPE, packed_supported, zorro_self_attention,
            zorro_self_attention_auto, zorro_self_attention_packed_qkv,
            zorro_self_attention_packed_qkv_auto,
        )

        inner = self.dim_head * self.heads
        x = BiaslessLayerNorm(name="norm")(x)
        kv_x = context if context is not None else x
        to_q = nn.Dense(inner, use_bias=False,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="to_q")
        to_kv = nn.Dense(inner * 2, use_bias=False,
                         kernel_init=xavier_uniform_fused(2), name="to_kv")

        def heads_split(t):
            return t.reshape(*t.shape[:-1], self.heads, self.dim_head)

        if packed_types is not None and context is None and use_pallas:
            # use_pallas: True = force the kernel; "auto" = resolved per
            # lowering platform (Pallas on TPU, XLA mask elsewhere).
            # Slab sizes use the packed-layout fused-qkv kernel: q/kv are
            # projected by ONE matmul against the concatenated weights and
            # the [B, N, 3I] slab feeds the kernel whole (head slices are
            # static lane offsets in VMEM) — per-column matmul results are
            # bitwise those of separate to_q/to_kv projections, and XLA no
            # longer materializes split copies to feed the custom call.
            # The q-tiled flash kernels for larger N keep [B*H, N, dh].
            if packed_supported(x.shape[1]):
                # 1-token calls only materialize the child params (same
                # names/shapes as the unfused path); results are dead code
                _ = to_q(x[:, :1, :])
                _ = to_kv(x[:, :1, :])
                w_qkv = jnp.concatenate(
                    [to_q.variables["params"]["kernel"],
                     to_kv.variables["params"]["kernel"]], axis=1)
                qkv = jnp.dot(x, w_qkv.astype(x.dtype))
                # NOTE: a block-sparse variant skipping dead type tiles
                # exists (ops/pallas_zorro_sparse.py) but measured ~2x
                # SLOWER at the flagship shape — the per-tile conditional
                # fragmentation costs more than the ~1/3 FLOP saving (see
                # PARITY.md). Dense whole-N matmuls stay the default.
                fn = (zorro_self_attention_packed_qkv_auto
                      if use_pallas == "auto"
                      else zorro_self_attention_packed_qkv)
                out2d = fn(qkv, packed_types, self.heads, fusion_type,
                           fusion_tail=fusion_tail)
            else:
                q = to_q(x)
                k, v = jnp.split(to_kv(x), 2, axis=-1)
                fn = (zorro_self_attention_auto if use_pallas == "auto"
                      else zorro_self_attention)
                out2d = fn(
                    heads_split(q), heads_split(k), heads_split(v),
                    packed_types, fusion_type,
                ).reshape(x.shape[0], x.shape[1], inner)
            return nn.Dense(
                x.shape[-1], use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(), name="to_out"
            )(out2d)
        q = to_q(x)
        kv = to_kv(kv_x)
        k, v = jnp.split(kv, 2, axis=-1)
        if packed_types is not None and attn_mask is None:
            attn_mask = zorro_mask_from_padded_types(
                packed_types, fusion_type, PAD_TYPE
            )[:, None]
        out = multihead_attention(
            heads_split(q), heads_split(k), heads_split(v), mask=attn_mask,
            empty_rows_uniform_over=empty_rows_uniform_over,
        )
        out = out.reshape(*out.shape[:-2], inner)
        return nn.Dense(
            x.shape[-1], use_bias=False, kernel_init=nn.initializers.xavier_uniform(), name="to_out"
        )(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth (zorro_utils.py:69-99)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class EncoderBlock(nn.Module):
    """Zorro-masked encoder block (zorro_utils.py:227-240)."""

    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    drop_path: float = 0.0
    # route the whole attention half-block through the single fused Pallas
    # kernel (ops/pallas_block_attn.py). Measured SLOWER at the flagship
    # shape on v5e-1 (57.3 -> 65.5 ms/step: XLA's big batched projection
    # matmuls + op overlap beat one sequential per-batch-row kernel), so
    # off by default — parity-tested and kept for shapes where the
    # intermediate HBM traffic dominates.
    fused_block: bool = False

    @nn.compact
    def __call__(self, x, attn_mask=None, packed_types=None, fusion_type=None,
                 use_pallas=False, deterministic: bool = True,
                 fusion_tail: int = 0):
        from ..ops.pallas_block_attn import (
            block_attn_supported, fused_block_attn, fused_block_attn_auto,
        )

        norm1 = BiaslessLayerNorm(name="norm1")
        attn = ZorroAttention(dim_head=self.dim_head, heads=self.heads,
                              name="attn")
        b, n, d = x.shape
        inner = self.dim_head * self.heads
        if (self.fused_block and use_pallas and packed_types is not None
                and attn_mask is None
                and (self.drop_path == 0.0 or deterministic)
                and block_attn_supported(n, d, inner)):
            # whole attention half-block in one Pallas kernel (norm1 +
            # attn-norm + q/kv proj + zorro attention + out proj +
            # residual; ops/pallas_block_attn.py). The 1-token calls below
            # only materialize the child params — identical names/shapes
            # to the unfused path, so checkpoints interchange — and their
            # results are dead code XLA eliminates.
            _ = norm1(x[:, :1, :])
            _ = attn(x[:, :1, :], packed_types=packed_types[:, :1],
                     fusion_type=fusion_type)
            g1 = norm1.variables["params"]["gamma"].reshape(1, d)
            ap = attn.variables["params"]
            fn = (fused_block_attn_auto if use_pallas == "auto"
                  else fused_block_attn)
            x = fn(x, packed_types, g1,
                   ap["norm"]["gamma"].reshape(1, d), ap["to_q"]["kernel"],
                   ap["to_kv"]["kernel"], ap["to_out"]["kernel"],
                   self.heads, fusion_type)
        else:
            h = attn(
                norm1(x), attn_mask=attn_mask,
                packed_types=packed_types, fusion_type=fusion_type,
                use_pallas=use_pallas, fusion_tail=fusion_tail,
            )
            x = x + DropPath(self.drop_path, name="dp1")(h, deterministic)
        h = GEGLUFeedForward(mult=self.ff_mult, name="mlp")(
            BiaslessLayerNorm(name="norm2")(x), use_pallas=use_pallas
        )
        x = x + DropPath(self.drop_path, name="dp2")(h, deterministic)
        return x


class FusionBlock(nn.Module):
    """Per-spatial-position cross-modal fusion (zorro_utils.py:243-258).

    Input: [B, N, M, D] stacks (modalities..., fusion) per fusion-grid slot.
    The reference attends over the M axis for every slot then keeps only the
    fusion row; we compute attention for the fusion-row query only — bitwise
    the same result at 1/M of the attention FLOPs.

      fus = fus + attn(norm1(stack))[fusion row]
      fus = fus + ff(norm2(fus))
    """

    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4

    @nn.compact
    def __call__(self, stack, key_valid=None):
        b, n, m, d = stack.shape
        inner = self.dim_head * self.heads
        h = BiaslessLayerNorm(name="norm1")(stack)
        # ZorroAttention inlined with fusion-row-only queries
        h = BiaslessLayerNorm(name="attn_norm")(h)
        q = nn.Dense(inner, use_bias=False, kernel_init=nn.initializers.xavier_uniform(), name="to_q")(
            h[:, :, -1, :]
        )  # [B, N, inner]
        kv = nn.Dense(inner * 2, use_bias=False, kernel_init=xavier_uniform_fused(2), name="to_kv")(h)
        k, v = jnp.split(kv, 2, axis=-1)  # [B, N, M, inner]

        # fusion-row attention over the tiny m axis as VPU mul-reduce:
        # 1 x m matmuls are MXU-pathological, elementwise ops are not
        q = q.reshape(b, n, 1, self.heads, self.dim_head)
        k = k.reshape(b, n, m, self.heads, self.dim_head)
        v = v.reshape(b, n, m, self.heads, self.dim_head)
        scale = self.dim_head ** -0.5
        sim = jnp.sum(
            (q * scale).astype(jnp.float32) * k.astype(jnp.float32), axis=-1
        )  # [B, N, M, H]
        if key_valid is not None:  # [B, N, M] bool
            sim = jnp.where(key_valid[..., None], sim, -0.7 * jnp.finfo(jnp.float32).max)
        attn = jax.nn.softmax(sim, axis=2)
        out = jnp.sum(attn[..., None].astype(v.dtype) * v, axis=2)  # [B, N, H, dh]
        out = out.reshape(b, n, inner)
        out = nn.Dense(d, use_bias=False, kernel_init=nn.initializers.xavier_uniform(), name="to_out")(out)

        fus = stack[:, :, -1, :] + out
        fus = fus + GEGLUFeedForward(mult=self.ff_mult, name="mlp")(
            BiaslessLayerNorm(name="norm2")(fus)
        )
        return fus


class FusionBlockFast(nn.Module):
    """Algebraically identical to FusionBlock, restructured for TPU:
    LayerNorms and the fused KV projection commute with token *selection*,
    so they run once on the flat sources (packed tokens, the mask-embedding
    table, fusion tokens) and the per-position stack is assembled as a KV
    grid via the one-hot MXU matmul — the [B, F, T+1, D] normed stack never
    materializes. Parameter names/shapes match FusionBlock exactly, so
    checkpoints interchange (equality is tested).
    """

    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4

    @nn.compact
    def __call__(self, packed, fusion, mask_emb, onehot, use, plane_valid=None,
                 use_pallas=False, slot=None):
        """packed [B,E,D]; fusion [B,F,D]; mask_emb [1,F,D];
        onehot [B,T*F,E] (or None when ``slot`` drives the gather path);
        use [B,T*F] bool; plane_valid [T+1] bool or None; slot [B,T*F] int
        (mask_info.ids_restore) — when given, the KV grid is assembled by
        the asymmetric gather-fwd/matmul-bwd op (ops/assemble.py) instead
        of the one-hot matmul; bit-identical both directions."""
        b, e, d_model = packed.shape
        f = fusion.shape[1]
        t = (onehot if slot is None else slot).shape[1] // f
        h, dh = self.heads, self.dim_head
        inner = h * dh

        norm1 = BiaslessLayerNorm(name="norm1")
        attn_norm = BiaslessLayerNorm(name="attn_norm")
        to_q = nn.Dense(inner, use_bias=False, kernel_init=nn.initializers.xavier_uniform(), name="to_q")
        to_kv = nn.Dense(inner * 2, use_bias=False, kernel_init=xavier_uniform_fused(2), name="to_kv")

        # (A merged norm+KV over the concatenated [packed; fusion] buffer was
        # measured and REVERTED: 59.4 -> 62.0 ms/step — XLA overlaps the two
        # smaller norm/matmul chains better than one merged chain.)
        h_packed = attn_norm(norm1(packed))
        h_mask = attn_norm(norm1(mask_emb))
        h_fus = attn_norm(norm1(fusion))

        q2 = to_q(h_fus)  # [B, F, inner]
        kv_p = to_kv(h_packed)  # [B, E, 2i]
        kv_m = to_kv(h_mask)  # [1, F, 2i]
        kv_f = to_kv(h_fus)  # [B, F, 2i]

        if slot is not None:
            from ..ops.assemble import grid_assemble

            kv_grid = grid_assemble(kv_p, slot, use)
        else:
            kv_grid = jnp.einsum(
                "bge,bec->bgc", onehot, kv_p,
                preferred_element_type=jnp.float32
            ).astype(packed.dtype)
        kv_grid = kv_grid + jnp.where(
            use[..., None], 0, jnp.tile(kv_m, (1, t, 1))
        )  # [B, T*F, 2i]

        from ..ops.pallas_fusion_attn import (
            fusion_row_attention, fusion_row_attention_auto,
            fusion_row_supported,
        )

        if (use_pallas and plane_valid is None
                and fusion_row_supported(f, t, inner)):
            # fused slot attention straight off the t-major grid — no
            # [B,T,F,h,dh] -> [B,F,T,h,dh] transpose copies, sim/softmax/
            # mix in VMEM (ops/pallas_fusion_attn.py)
            fn = (fusion_row_attention_auto if use_pallas == "auto"
                  else fusion_row_attention)
            out = fn(q2, kv_grid, kv_f, h, dh)
        else:
            q = q2.reshape(b, f, h, dh)
            k_g, v_g = jnp.split(kv_grid.reshape(b, t, f, 2 * inner), 2, axis=-1)
            k_g = k_g.reshape(b, t, f, h, dh).transpose(0, 2, 1, 3, 4)  # [B,F,T,h,dh]
            v_g = v_g.reshape(b, t, f, h, dh).transpose(0, 2, 1, 3, 4)
            k_f, v_f = jnp.split(kv_f.reshape(b, f, 2, h, dh), 2, axis=2)
            k = jnp.concatenate([k_g, k_f], axis=2)  # [B, F, T+1, h, dh]
            v = jnp.concatenate([v_g, v_f], axis=2)

            scale = dh ** -0.5
            sim = jnp.sum(
                (q[:, :, None] * scale).astype(jnp.float32) * k.astype(jnp.float32),
                axis=-1,
            )  # [B, F, T+1, h]
            if plane_valid is not None:
                sim = jnp.where(plane_valid[None, None, :, None], sim,
                                -0.7 * jnp.finfo(jnp.float32).max)
            attn = jax.nn.softmax(sim, axis=2)
            out = jnp.sum(attn[..., None].astype(v.dtype) * v, axis=2)  # [B,F,h,dh]
            out = out.reshape(b, f, inner)
        out = nn.Dense(d_model, use_bias=False,
                       kernel_init=nn.initializers.xavier_uniform(), name="to_out")(out)

        fus = fusion + out
        fus = fus + GEGLUFeedForward(mult=self.ff_mult, name="mlp")(
            BiaslessLayerNorm(name="norm2")(fus), use_pallas=use_pallas
        )
        return fus


class ViTSelfAttention(nn.Module):
    """Fused-QKV self-attention (multimae_utils.py:158-182), used by the
    reconstruction decoder transformer.

    (A Pallas routing of this attention was measured and reverted: at
    n=256/dh=32 the per-(batch,head) program overhead loses to XLA by
    ~1.5 ms/step.)
    """

    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, use_pallas=False):
        from ..ops.pallas_small_attn import (
            small_attention_qkv, small_attention_qkv_auto,
            small_attention_supported,
        )

        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(
            c * 3, use_bias=self.qkv_bias, kernel_init=xavier_uniform_fused(3), name="qkv"
        )(x)

        if use_pallas and small_attention_supported(n, c, hd):
            # 'auto' resolves per-platform at lowering time (Pallas on TPU,
            # XLA elsewhere) — never embed a Mosaic call in a CPU executable
            # or fall into interpret mode on CPU
            fn = (small_attention_qkv_auto if use_pallas == "auto"
                  else small_attention_qkv)
            # fused whole-row kernel: the [N, N] f32 sim stays in VMEM (the
            # XLA path materializes [B, H, N, N] f32 in HBM — measured
            # ~9 TFLOP/s at the decoder's n=256/dh=32), consuming the fused
            # [B, N, 3C] projection whole (static lane slices) so XLA emits
            # no split copies around the custom call. The earlier
            # per-(batch,head)-program Pallas routing that lost to XLA at
            # this size is superseded by this per-batch-row design.
            out = fn(qkv, self.num_heads, hd)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def hs(t):
                return t.reshape(b, n, self.num_heads, hd)

            out = multihead_attention(hs(q), hs(k), hs(v)).reshape(b, n, c)
        return nn.Dense(c, kernel_init=nn.initializers.xavier_uniform(), name="proj")(out)


class ViTBlock(nn.Module):
    """Standard pre-norm ViT block (multimae_utils.py:217-232)."""

    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, use_pallas=False):
        x = x + ViTSelfAttention(self.num_heads, self.qkv_bias, name="attn")(
            LayerNorm(eps=self.norm_eps, name="norm1")(x), use_pallas=use_pallas
        )
        x = x + Mlp(int(x.shape[-1] * self.mlp_ratio), name="mlp")(
            LayerNorm(eps=self.norm_eps, name="norm2")(x), use_pallas=use_pallas
        )
        return x


class ViTCrossAttention(nn.Module):
    """Cross-attention (multimae_utils.py:185-214)."""

    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, context, attn_mask=None):
        b, n, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=nn.initializers.xavier_uniform(), name="q")(x)
        kv = nn.Dense(c * 2, use_bias=self.qkv_bias, kernel_init=xavier_uniform_fused(2), name="kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        m = context.shape[1]
        out = multihead_attention(
            q.reshape(b, n, self.num_heads, hd),
            k.reshape(b, m, self.num_heads, hd),
            v.reshape(b, m, self.num_heads, hd),
            mask=attn_mask,
        )
        out = out.reshape(b, n, c)
        return nn.Dense(c, kernel_init=nn.initializers.xavier_uniform(), name="proj")(out)


class ViTDecoderBlock(nn.Module):
    """Self-attn + cross-attn + MLP decoder block (multimae_utils.py:235-253)."""

    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, context):
        x = x + ViTSelfAttention(self.num_heads, self.qkv_bias, name="self_attn")(
            LayerNorm(eps=self.norm_eps, name="norm1")(x)
        )
        x = x + ViTCrossAttention(self.num_heads, self.qkv_bias, name="cross_attn")(
            LayerNorm(eps=self.norm_eps, name="query_norm")(x),
            LayerNorm(eps=self.norm_eps, name="context_norm")(context),
        )
        x = x + Mlp(int(x.shape[-1] * self.mlp_ratio), name="mlp")(
            LayerNorm(eps=self.norm_eps, name="norm2")(x)
        )
        return x


class SnapshotCrossAttention(nn.Module):
    """Per-position cross-attention over a small stack axis
    (zorro_utils.py:198-224 CrossAttention as used by the 20231203 snapshot's
    attn_pool_modalities, multimae_crossattn_20231203.py:514-520): each
    query token attends over its own T-entry modality stack; q/kv are
    bias-free, the output projection carries a bias."""

    num_heads: int = 8

    @nn.compact
    def __call__(self, q_tokens, ctx):  # [B, E, D], [B, E, T, D] -> [B, E, D]
        b, e, d = q_tokens.shape
        t = ctx.shape[2]
        h = self.num_heads
        dh = d // h
        q = nn.Dense(d, use_bias=False,
                     kernel_init=nn.initializers.xavier_uniform(), name="q")(q_tokens)
        kv = nn.Dense(2 * d, use_bias=False,
                      kernel_init=xavier_uniform_fused(2), name="kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        qh = q.reshape(b, e, h, dh)
        kh = k.reshape(b, e, t, h, dh)
        vh = v.reshape(b, e, t, h, dh)
        # tiny stack axis: VPU mul-reduce, not 1 x t matmuls
        sim = jnp.sum(
            (qh[:, :, None] * (dh ** -0.5)).astype(jnp.float32)
            * kh.astype(jnp.float32), axis=-1
        )  # [B, E, T, h]
        attn = jax.nn.softmax(sim, axis=2)
        out = jnp.sum(attn[..., None].astype(vh.dtype) * vh, axis=2)
        out = out.reshape(b, e, d)
        return nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(),
                        name="proj")(out)


class AttentionBiLSTM(nn.Module):
    """BiLSTM + attention pooling over a short axis
    (zorro_utils.py:276-299 AttentionBiLSTM / Attention_LSTM): run a
    bidirectional LSTM over the m-axis, sum the two directions, score each
    position with Linear(tanh(y)), softmax, weighted-sum."""

    @nn.compact
    def __call__(self, x):  # [N, M, D] -> [N, D]
        d = x.shape[-1]
        m = x.shape[1]
        cell_f = nn.LSTMCell(features=d, name="lstm_fwd")
        cell_b = nn.LSTMCell(features=d, name="lstm_bwd")
        # manual unroll over the short m-axis (2-5 steps): avoids lax.scan,
        # which XLA:CPU SPMD-partitions into a deadlocking collective when
        # the batch dim has been reshaped away
        key = jax.random.PRNGKey(0)  # carry init is zeros; key unused
        carry = cell_f.initialize_carry(key, x[:, 0].shape)
        fwd_ys = []
        for t in range(m):
            carry, y = cell_f(carry, x[:, t])
            fwd_ys.append(y)
        carry = cell_b.initialize_carry(key, x[:, 0].shape)
        bwd_ys = [None] * m
        for t in reversed(range(m)):
            carry, y = cell_b(carry, x[:, t])
            bwd_ys[t] = y
        fwd = jnp.stack(fwd_ys, axis=1)
        bwd = jnp.stack(bwd_ys, axis=1)
        y = fwd + bwd  # reference sums the direction outputs (:295)
        scores = nn.Dense(1, kernel_init=nn.initializers.xavier_uniform(),
                          name="attention")(jnp.tanh(y))[..., 0]
        alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(y.dtype)
        return jnp.einsum("nm,nmd->nd", alpha, y)


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)
