"""Per-pixel-embedding MaskFormer query decoder — the ORIGINAL (DETR-style)
`StandardTransformerDecoder` (reference downstream/*/modeling/
transformer_decoder/maskformer_transformer_decoder.py:12-106 + the vendored
DETR `Transformer`, transformer.py:19-369).

Differences from `MultiScaleMaskedTransformerDecoder` (the Mask2Former one the
reference drivers actually use): a single feature level, no masked
cross-attention, an optional memory self-attention encoder (enc_layers), and
queries initialised to zeros with a learned positional embedding. Batch-first
NHWC; post-norm by default, pre-norm via `pre_norm=True` — both orders of the
vendored DETR layer (transformer.py:204-286) are reproduced.

TPU notes: layers are unrolled Python loops over static shapes (the decoder is
3-10 layers — scan would only slow compile-time cache hits); all attention is
the shared `ops.attention.multihead_attention` whole-array path, which XLA
maps onto the MXU directly at Q=100 / HW<=4096 sizes.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multihead_attention
from .mask2former_decoder import MHA, MLP
from .position_encoding import position_embedding_sine


class _EncoderLayer(nn.Module):
    """DETR TransformerEncoderLayer (transformer.py:204-252): self-attention
    over memory with pos added to q/k, then FFN; post- or pre-norm."""

    d_model: int
    n_heads: int
    dim_feedforward: int
    pre_norm: bool = False

    @nn.compact
    def __call__(self, src, pos):
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        attn = MHA(self.d_model, self.n_heads, name="self_attn")
        lin1 = nn.Dense(self.dim_feedforward,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear1")
        lin2 = nn.Dense(self.d_model,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear2")
        if self.pre_norm:
            h = norm1(src)
            src = src + attn(h + pos, h + pos, h)
            src = src + lin2(nn.relu(lin1(norm2(src))))
        else:
            src = norm1(src + attn(src + pos, src + pos, src))
            src = norm2(src + lin2(nn.relu(lin1(src))))
        return src


class _DecoderLayer(nn.Module):
    """DETR TransformerDecoderLayer (transformer.py:254-340): query self-attn,
    cross-attn into memory (query_pos/pos added to q/k), FFN."""

    d_model: int
    n_heads: int
    dim_feedforward: int
    pre_norm: bool = False

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        norm3 = nn.LayerNorm(name="norm3")
        self_attn = MHA(self.d_model, self.n_heads, name="self_attn")
        cross_attn = MHA(self.d_model, self.n_heads, name="multihead_attn")
        lin1 = nn.Dense(self.dim_feedforward,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear1")
        lin2 = nn.Dense(self.d_model,
                        kernel_init=nn.initializers.xavier_uniform(), name="linear2")
        if self.pre_norm:
            h = norm1(tgt)
            tgt = tgt + self_attn(h + query_pos, h + query_pos, h)
            h = norm2(tgt)
            tgt = tgt + cross_attn(h + query_pos, memory + pos, memory)
            tgt = tgt + lin2(nn.relu(lin1(norm3(tgt))))
        else:
            q = tgt + query_pos
            tgt = norm1(tgt + self_attn(q, q, tgt))
            tgt = norm2(tgt + cross_attn(tgt + query_pos, memory + pos, memory))
            tgt = norm3(tgt + lin2(nn.relu(lin1(tgt))))
        return tgt


class StandardTransformerDecoder(nn.Module):
    """maskformer_transformer_decoder.py:12-106 StandardTransformerDecoder:
    sine pos encoding over the (single) feature map, optional input projection
    when in_channels != hidden_dim, zero-initialised queries + learned query
    embedding, DETR decoder stack with deep supervision, class/mask heads.

    Call with the pixel-decoder outputs: ``x`` is ONE feature map (the
    reference feeds the transformer-attention feature level) and
    ``mask_features`` the per-pixel embedding map. Returns the same dict
    schema as MultiScaleMaskedTransformerDecoder, so `losses/set_criterion.py`
    and `infer_segmentation.py` consume it unchanged.
    """

    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    n_heads: int = 8
    dim_feedforward: int = 2048
    enc_layers: int = 0
    dec_layers: int = 10
    mask_dim: int = 256
    pre_norm: bool = False
    deep_supervision: bool = True
    mask_classification: bool = True
    enforce_input_project: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask_features: jnp.ndarray):
        """x [B, H, W, C] single feature level; mask_features
        [B, Hm, Wm, mask_dim]."""
        b, h, w, c = x.shape
        d = self.hidden_dim

        pos = position_embedding_sine(h, w, d // 2).reshape(1, h * w, d)
        pos = jnp.broadcast_to(pos, (b, h * w, d))

        src = x.reshape(b, h * w, c)
        if c != d or self.enforce_input_project:
            # 1x1 conv == Dense on the flattened map (input_proj, :53-57)
            src = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(),
                           name="input_proj")(src)

        for i in range(self.enc_layers):
            src = _EncoderLayer(d, self.n_heads, self.dim_feedforward,
                                self.pre_norm, name=f"enc{i}")(src, pos)
        if self.enc_layers and self.pre_norm:
            src = nn.LayerNorm(name="encoder_norm")(src)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, d)
        )
        qpos = jnp.broadcast_to(query_embed[None], (b, self.num_queries, d))
        tgt = jnp.zeros((b, self.num_queries, d), src.dtype)  # transformer.py:71

        decoder_norm = nn.LayerNorm(name="decoder_norm")
        intermediate = []
        for i in range(self.dec_layers):
            tgt = _DecoderLayer(d, self.n_heads, self.dim_feedforward,
                                self.pre_norm, name=f"dec{i}")(tgt, src, pos, qpos)
            intermediate.append(decoder_norm(tgt))

        class_embed = (
            nn.Dense(self.num_classes + 1,
                     kernel_init=nn.initializers.xavier_uniform(), name="class_embed")
            if self.mask_classification else None
        )
        mask_embed_mlp = MLP(d, self.mask_dim, 3, name="mask_embed")

        def heads(dec):
            logits = class_embed(dec) if class_embed is not None else None
            m_emb = mask_embed_mlp(dec)  # [B, Q, mask_dim]
            masks = jnp.einsum("bqc,bhwc->bqhw", m_emb, mask_features)
            return logits, masks

        if self.deep_supervision:
            outs = [heads(dec) for dec in intermediate]
            out = {"pred_masks": outs[-1][1]}
            if self.mask_classification:
                out["pred_logits"] = outs[-1][0]
            out["aux_outputs"] = [
                ({"pred_logits": lg, "pred_masks": m} if self.mask_classification
                 else {"pred_masks": m})
                for lg, m in outs[:-1]
            ]
        else:
            logits, masks = heads(intermediate[-1])
            out = {"pred_masks": masks}
            if self.mask_classification:
                out["pred_logits"] = logits
        return out
