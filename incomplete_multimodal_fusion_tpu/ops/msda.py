"""Multi-scale deformable attention core.

TPU equivalent of the reference's C++/CUDA `MultiScaleDeformableAttention`
extension (downstream/*/modeling/pixel_decoder/ops/src/, ~1,695 LoC). Note
the reference's *live* code path never calls the CUDA op — it uses the
grid_sample fallback unconditionally (ms_deform_attn.py:111-118), so the
numeric parity target is `ms_deform_attn_core_pytorch`
(ms_deform_attn_func.py:52-77): per (query, head, level, point) bilinear
sampling with zero padding and align_corners=False, weighted-summed over
(level, point).

This module is the pure-XLA implementation (one-hot-free gather form that
XLA lowers to dynamic-gathers + fused FMAs); ops/pallas_msda.py provides the
fused VMEM kernel validated against this, mirroring how ops/test.py
validates CUDA against the torch core.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img [H, W, C] at continuous pixel coords (x, y) with zero
    padding, matching F.grid_sample(..., mode='bilinear',
    padding_mode='zeros', align_corners=False) after the caller converts
    normalized grid g in [-1,1] to pixels: p = ((g + 1) * size - 1) / 2.

    x, y: [...] float; returns [..., C].
    """
    h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * inb[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    )


def ms_deform_attn_core(
    value: jnp.ndarray,  # [B, S, M, D] flattened levels
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W), ...]
    sampling_locations: jnp.ndarray,  # [B, Lq, M, L, P, 2] in [0, 1]
    attention_weights: jnp.ndarray,  # [B, Lq, M, L, P]
) -> jnp.ndarray:
    """Returns [B, Lq, M*D] (ms_deform_attn_func.py:52-77 semantics)."""
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert l == len(spatial_shapes)
    splits = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for sz in splits:
        offsets.append(offsets[-1] + sz)
    assert offsets[-1] == s

    out = jnp.zeros((b, lq, m, d), jnp.promote_types(value.dtype, jnp.float32))
    for lid, (h, w) in enumerate(spatial_shapes):
        val_l = value[:, offsets[lid] : offsets[lid + 1]]  # [B, H*W, M, D]
        val_l = val_l.reshape(b, h, w, m, d).transpose(0, 3, 1, 2, 4)  # [B,M,H,W,D]
        loc = sampling_locations[:, :, :, lid]  # [B, Lq, M, P, 2]
        # grid_sample align_corners=False pixel mapping
        gx = 2.0 * loc[..., 0] - 1.0
        gy = 2.0 * loc[..., 1] - 1.0
        px = ((gx + 1.0) * w - 1.0) / 2.0
        py = ((gy + 1.0) * h - 1.0) / 2.0

        def per_bm(img, x, y):  # img [H,W,D], x/y [Lq,P]
            return bilinear_sample(img, x, y)  # [Lq, P, D]

        sampled = jax.vmap(  # over batch
            jax.vmap(per_bm, in_axes=(0, 1, 1))  # over heads (axis 1 of [Lq, M, P])
        )(val_l, px, py)  # [B, M, Lq, P, D]
        wts = attention_weights[:, :, :, lid].transpose(0, 2, 1, 3)  # [B, M, Lq, P]
        contrib = jnp.einsum("bmqpd,bmqp->bqmd", sampled.astype(jnp.float32),
                             wts.astype(jnp.float32))
        out = out + contrib
    return out.reshape(b, lq, m * d).astype(value.dtype)
