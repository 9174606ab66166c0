"""Mask2Former query decoder (reference downstream/*/modeling/
transformer_decoder/mask2former_transformer_decoder.py:200-382):
100 learned queries, 3 feature levels round-robin, masked cross-attention
with the attention mask derived from the previous layer's mask prediction
(sigmoid < 0.5 blocked, fully-blocked rows unblocked), self-attn, FFN,
deep-supervision aux outputs, and the class/mask prediction heads.

Batch-first NHWC; decoder layers are post-norm (pre_norm=False default).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multihead_attention
from .position_encoding import position_embedding_sine


class MHA(nn.Module):
    """torch.nn.MultiheadAttention equivalent (in/out projections, bias)."""

    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None):
        d = self.d_model
        hd = d // self.n_heads
        qp = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), name="q_proj")(q)
        kp = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), name="k_proj")(k)
        vp = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), name="v_proj")(v)

        def hs(t):
            return t.reshape(t.shape[0], t.shape[1], self.n_heads, hd)

        out = multihead_attention(hs(qp), hs(kp), hs(vp), mask=attn_mask)
        out = out.reshape(out.shape[0], out.shape[1], d)
        return nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), name="out_proj")(out)


class CrossAttentionLayer(nn.Module):
    """Post-norm masked cross-attention (mask2former_transformer_decoder.py)."""

    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, tgt, memory, attn_mask, pos, query_pos):
        tgt2 = MHA(self.d_model, self.n_heads, name="mha")(
            tgt + query_pos, memory + pos, memory, attn_mask=attn_mask
        )
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt + tgt2)


class SelfAttentionLayer(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, tgt, query_pos):
        q = tgt + query_pos
        tgt2 = MHA(self.d_model, self.n_heads, name="mha")(q, q, tgt)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt + tgt2)


class FFNLayer(nn.Module):
    d_model: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, tgt):
        h = nn.Dense(self.dim_feedforward, kernel_init=nn.initializers.xavier_uniform(),
                     name="linear1")(tgt)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                     name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt + h)


class MLP(nn.Module):
    """3-layer ReLU MLP for the mask embedding head."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim,
                                 kernel_init=nn.initializers.xavier_uniform(),
                                 name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, kernel_init=nn.initializers.xavier_uniform(),
                        name=f"layer{self.num_layers - 1}")(x)


class MultiScaleMaskedTransformerDecoder(nn.Module):
    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    n_heads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 3  # configs/maskformer_ake150.yaml:27 DEC_LAYERS
    mask_dim: int = 256
    num_feature_levels: int = 3

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], mask_features: jnp.ndarray):
        """x: multi-scale features low->high resolution (NHWC);
        mask_features: [B, H, W, mask_dim]. Returns the reference dict
        {'pred_logits', 'pred_masks' (NHWC->BQHW), 'aux_outputs'}."""
        assert len(x) == self.num_feature_levels
        b = x[0].shape[0]
        d = self.hidden_dim

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, d)
        )
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, d)
        )
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, d)
        )

        srcs, poss, sizes = [], [], []
        for i, f in enumerate(x):
            h, w = f.shape[1], f.shape[2]
            sizes.append((h, w))
            pos = position_embedding_sine(h, w, d // 2).reshape(1, h * w, d)
            src = f.reshape(b, h * w, f.shape[-1]) + level_embed[i][None, None, :]
            srcs.append(src)
            poss.append(jnp.broadcast_to(pos, (b, h * w, d)))

        output = jnp.broadcast_to(query_feat[None], (b, self.num_queries, d))
        qpos = jnp.broadcast_to(query_embed[None], (b, self.num_queries, d))

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1,
                               kernel_init=nn.initializers.xavier_uniform(),
                               name="class_embed")
        mask_embed_mlp = MLP(d, self.mask_dim, 3, name="mask_embed")

        def prediction_heads(output, target_size):
            dec = decoder_norm(output)
            logits = class_embed(dec)
            m_emb = mask_embed_mlp(dec)  # [B, Q, mask_dim]
            masks = jnp.einsum("bqc,bhwc->bqhw", m_emb, mask_features)
            th, tw = target_size
            # antialias=False: torch F.interpolate(bilinear, align_corners=
            # False) does NOT filter on downsampling, and this resize is a
            # 32->4/8/16 downsample — jax's default antialiased triangle
            # kernel flips mask-threshold bits vs the reference
            small = jax.image.resize(
                masks, (b, self.num_queries, th, tw), method="bilinear",
                antialias=False,
            )
            # True = may attend (inverse of the torch key-mask convention)
            allowed = jax.lax.stop_gradient(jax.nn.sigmoid(small) >= 0.5)
            allowed = allowed.reshape(b, self.num_queries, th * tw)
            # un-block fully-blocked query rows (decoder :317)
            all_blocked = ~jnp.any(allowed, axis=-1, keepdims=True)
            allowed = allowed | all_blocked
            return logits, masks, allowed[:, None]  # [B, 1, Q, HW]

        pred_classes, pred_masks = [], []
        logits, masks, attn = prediction_heads(output, sizes[0])
        pred_classes.append(logits)
        pred_masks.append(masks)

        for i in range(self.dec_layers):
            li = i % self.num_feature_levels
            output = CrossAttentionLayer(d, self.n_heads, name=f"cross{i}")(
                output, srcs[li], attn, poss[li], qpos
            )
            output = SelfAttentionLayer(d, self.n_heads, name=f"self{i}")(output, qpos)
            output = FFNLayer(d, self.dim_feedforward, name=f"ffn{i}")(output)
            logits, masks, attn = prediction_heads(
                output, sizes[(i + 1) % self.num_feature_levels]
            )
            pred_classes.append(logits)
            pred_masks.append(masks)

        return {
            "pred_logits": pred_classes[-1],
            "pred_masks": pred_masks[-1],
            "aux_outputs": [
                {"pred_logits": c, "pred_masks": m}
                for c, m in zip(pred_classes[:-1], pred_masks[:-1])
            ],
        }
