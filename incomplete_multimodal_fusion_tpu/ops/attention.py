"""Masked multi-head attention primitives and Zorro mask construction.

The Zorro mask is block-structured over token types (modality-diagonal plus a
full fusion row, reference multimae_crossattn.py:431-447). With the packed
static layout the mask is an ordinary [N, N] (or [B, N, N]) boolean tensor
recomputed per step from the packed token types — a few cheap vector ops, no
recompilation as modality-dropout patterns change.

Attention logits and softmax run in float32 regardless of compute dtype
(TPU-native analogue of CUDA autocast keeping softmax in fp32).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).max) * -1.0


def multihead_attention(
    q: jnp.ndarray,  # [B, Nq, H, Dh]
    k: jnp.ndarray,  # [B, Nk, H, Dh]
    v: jnp.ndarray,  # [B, Nk, H, Dh]
    mask: Optional[jnp.ndarray] = None,  # bool, broadcastable to [B, H, Nq, Nk]
    scale: Optional[float] = None,
    empty_rows_uniform_over: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked SDPA; True in `mask` = may attend (reference zorro_utils.py:184-194).

    Degenerate all-masked query rows (e.g. the pool token of a modality with
    zero visible tokens): the reference's ``masked_fill(~mask, -finfo.max)``
    followed by softmax makes every logit equal, so such a row UNIFORM-attends
    over its entire key sequence (zorro_utils.py:186-188) — a quirk, but one
    the trajectory feels (round-4 verdict Weak #3: nine one-sided loss
    outliers, all at masks where one task had zero visible tokens).
    ``empty_rows_uniform_over`` (bool, broadcastable to [B, H, Nq, Nk], True
    for the keys the reference sequence actually contains — valid tokens, no
    padding slots) reproduces that: empty rows average those keys uniformly.
    Without it, empty rows output zero — still padding-independent, used
    where the reference side would gather an empty token set (contrastive
    modality pools: an empty-context torch matmul yields zeros).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dtype = q.dtype
    sim = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale
    if mask is not None:
        sim = jnp.where(mask, sim, NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1)
    if mask is not None:
        any_valid = jnp.any(mask, axis=-1, keepdims=True)  # [B, H, Nq, 1]
        if empty_rows_uniform_over is not None:
            w = empty_rows_uniform_over.astype(attn.dtype)
            w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
            attn = jnp.where(any_valid, attn, w)
        else:
            attn = jnp.where(any_valid, attn, 0.0)
    out = jnp.einsum("bhij,bjhd->bihd", attn.astype(dtype), v, preferred_element_type=jnp.float32)
    return out.astype(dtype)


def zorro_mask_from_types(
    types_q: jnp.ndarray,  # [.., Nq] int
    types_k: jnp.ndarray,  # [.., Nk] int
    fusion_type: int,
    valid_k: Optional[jnp.ndarray] = None,  # [.., Nk] bool, False = padding slot
) -> jnp.ndarray:
    """(same type) OR (query is fusion); padded key slots never attended to."""
    m = (types_q[..., :, None] == types_k[..., None, :]) | (
        types_q[..., :, None] == fusion_type
    )
    if valid_k is not None:
        m = m & valid_k[..., None, :]
    return m


def zorro_mask_from_padded_types(
    types: jnp.ndarray,  # [B, N] int, PAD-coded padding slots
    fusion_type: int,
    pad_type: int,
) -> jnp.ndarray:
    """Same rule the Pallas kernel applies in-VMEM (ops/pallas_attn.py):
    attend iff same type, or query is fusion and key is not padding."""
    tq = types[..., :, None]
    tk = types[..., None, :]
    return (tq == tk) | ((tq == fusion_type) & (tk != pad_type))


def packed_token_types(
    order: jnp.ndarray,  # [B, N_total]
    num_tokens_per_task,  # static tuple
    num_encoded_tokens: int,
    num_fusion_tokens: int,
    fusion_type: int,
) -> jnp.ndarray:
    """Token-type id for each packed slot: gather of the full type vector by
    the packing permutation, plus the trailing fusion block. [B, E + F]."""
    bounds = jnp.cumsum(jnp.asarray(num_tokens_per_task, jnp.int32))
    full_types = jnp.searchsorted(bounds, order[:, :num_encoded_tokens], side="right").astype(jnp.int32)
    fus = jnp.full((order.shape[0], num_fusion_tokens), fusion_type, jnp.int32)
    return jnp.concatenate([full_types, fus], axis=1)


def packed_valid(
    num_visible: jnp.ndarray,  # [B]
    num_encoded_tokens: int,
    num_fusion_tokens: int,
) -> jnp.ndarray:
    """[B, E + F] bool: True for real slots. Fusion tokens always valid."""
    slot = jnp.arange(num_encoded_tokens, dtype=jnp.int32)[None, :]
    vis = slot < num_visible[:, None]
    fus = jnp.ones((num_visible.shape[0], num_fusion_tokens), bool)
    return jnp.concatenate([vis, fus], axis=1)
