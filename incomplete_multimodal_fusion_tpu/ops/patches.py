"""Patchify / unpatchify as pure reshape-einsum ops (MXU-friendly).

The reference patchifies with a strided Conv2d (input_adapters.py:88-91);
on TPU we express the same linear map as reshape + one large matmul so XLA
tiles it straight onto the MXU, and the projection weight keeps the
(P*P*C, D) layout of an nn.Linear.
"""
from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange


def patchify(imgs: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/p * W/p), p*p*C] patch pixels.

    Pixel order inside a patch is (ph, pw, c), matching the reference loss
    patchify (criterion.py:75-78 'b c (nh p1) (nw p2) -> b (nh nw) (p1 p2 c)').
    """
    b, h, w, c = imgs.shape
    nh, nw = h // p, w // p
    x = imgs.reshape(b, nh, p, nw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b nh nw p1 p2 c
    return x.reshape(b, nh * nw, p * p * c)


def unpatchify(x: jnp.ndarray, p: int, nh: int, nw: int, c: int) -> jnp.ndarray:
    """[B, nh*nw, p*p*C] -> [B, nh*p, nw*p, C]."""
    b = x.shape[0]
    x = x.reshape(b, nh, nw, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b nh p1 nw p2 c
    return x.reshape(b, nh * p, nw * p, c)


def conv_patch_embed(imgs: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, p: int):
    """Strided-conv patch embedding as a single matmul.

    kernel: [p*p*C, D] (pixel order (ph, pw, c)), bias: [D].
    Equivalent to nn.Conv2d(C, D, kernel_size=p, stride=p) on NCHW input
    (reference input_adapters.py:88-91) up to weight layout.
    """
    patches = patchify(imgs, p)
    return patches @ kernel + bias
