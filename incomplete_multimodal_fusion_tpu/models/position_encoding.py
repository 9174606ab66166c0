"""Sine position embedding for dense feature maps (reference
downstream/*/modeling/transformer_decoder/position_encoding.py:12-52,
normalized DETR variant; no padding masks on TPU so the cumsum reduces to
row/col indices)."""
from __future__ import annotations

import math

import jax.numpy as jnp


def position_embedding_sine(
    h: int, w: int, num_pos_feats: int, temperature: float = 10000.0,
    normalize: bool = True, scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """Returns [h, w, 2*num_pos_feats] (channel order [pos_y, pos_x])."""
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    # interleave sin on even channels, cos on odd (position_encoding.py:44-49)
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1).reshape(h, w, -1)
    return jnp.concatenate([py, px], axis=-1)
