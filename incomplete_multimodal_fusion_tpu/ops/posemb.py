"""2D sine-cosine positional embeddings.

Numerically matches the reference ``build_2d_sincos_posemb``
(pretraining/multimae/multimae_utils.py:29-45, MoCo-v3 style): channels are
[sin(w), cos(w), sin(h), cos(h)] blocks of dim/4 each, with
omega = 1/temperature**(i/(dim/4)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def build_2d_sincos_posemb(h: int, w: int, embed_dim: int, temperature: float = 10000.0):
    """Returns [h*w, embed_dim] float32 posemb, flattened in (w-major) order.

    The reference builds a meshgrid with torch.meshgrid(grid_w, grid_h)
    (indexing='ij'), flattens, then rearranges 'b (h w) d -> b d h w'.  The
    net effect is that the flattened token order is row-major over (h, w)
    with grid_w varying over the FIRST meshgrid axis; we reproduce the same
    final [h, w] layout directly.
    """
    assert embed_dim % 4 == 0, "embed_dim must be divisible by 4"
    # torch.meshgrid(grid_w, grid_h) default indexing='ij':
    #   grid_w[i, j] = i (over w), grid_h[i, j] = j (over h); flatten order is
    #   (w, h). After rearrange '(h w)'->h w the token at (y, x) has
    #   grid_w = y_index-of-first-axis... reproduce exactly by computing the
    #   same flattened sequence then reshaping with (h, w).
    gw = jnp.arange(w, dtype=jnp.float32)
    gh = jnp.arange(h, dtype=jnp.float32)
    grid_w = jnp.repeat(gw, h)  # meshgrid ij then flatten: w-axis outer
    grid_h = jnp.tile(gh, w)
    pos_dim = embed_dim // 4
    omega = jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim
    omega = 1.0 / (temperature ** omega)
    out_w = jnp.einsum("m,d->md", grid_w, omega)
    out_h = jnp.einsum("m,d->md", grid_h, omega)
    pos = jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )
    # reference: rearrange(pos_emb, 'b (h w) d -> b d h w', h=h, w=w) -- the
    # flat order above IS the reference's '(h w)' order.
    return pos  # [h*w, embed_dim]


def resize_posemb(pos: jnp.ndarray, src_hw, dst_hw):
    """Bicubic-resize a [h*w, d] posemb grid to a new grid size.

    Mirrors F.interpolate(..., mode='bicubic', align_corners=False)
    (input_adapters.py:113). Identity when sizes match (the common case, so
    the interpolation never enters the compiled graph).
    """
    sh, sw = src_hw
    dh, dw = dst_hw
    if (sh, sw) == (dh, dw):
        return pos
    d = pos.shape[-1]
    img = pos.reshape(sh, sw, d)
    out = jax.image.resize(img, (dh, dw, d), method="bicubic")
    return out.reshape(dh * dw, d)
