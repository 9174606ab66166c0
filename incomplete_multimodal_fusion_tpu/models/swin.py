"""Swin Transformer backbone
(reference downstream/*/modeling/backbone/swin.py, 682 LoC — vendored but not
referenced by the reference drivers; provided here for the same completeness).

Compact NHWC implementation: window attention with relative position bias,
shifted windows, patch merging; returns the res2..res5 pyramid. Defaults are
Swin-T (depths 2/2/6/2, dims 96..768, window 7).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm, Mlp, trunc_normal_init


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C] (H, W divisible by w)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(windows: jnp.ndarray, w: int, h: int, wd: int) -> jnp.ndarray:
    b = windows.shape[0] // ((h // w) * (wd // w))
    x = windows.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def relative_position_index(w: int, table_w: int) -> np.ndarray:
    """Relative-position index for a runtime window w into a bias table built
    for table_w >= w (lets smaller effective windows — e.g. multi-scale TTA —
    reuse the trained table)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (table_w - 1)
    return (rel[..., 0] * (2 * table_w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [nW*B, N, C]; mask: [nW, N, N] additive or None
        bnw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(c * 3, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(bnw, n, 3, h, hd).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]  # [bnw, h, n, hd]
        attn = (q * hd ** -0.5) @ k.transpose(0, 1, 3, 2)

        w_rt = int(round(n ** 0.5))  # runtime window (<= configured window)
        rpb_table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = jnp.asarray(relative_position_index(w_rt, self.window))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        b, h, wd, c = x.shape
        w = min(self.window, h, wd)
        shift = self.shift if w == self.window else 0

        shortcut = x
        y = LayerNorm(name="norm1")(x)
        pad_b = (w - h % w) % w
        pad_r = (w - wd % w) % w
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, wd + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            # attention mask across shifted-window boundaries
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), w)[..., 0]  # [nW, w*w]
            amask = jnp.where(mw[:, :, None] == mw[:, None, :], 0.0, -100.0)
        else:
            amask = None
        wins = window_partition(y, w)
        # table sized by the configured window; runtime window may be smaller
        wins = WindowAttention(c, self.num_heads, self.window, name="attn")(wins, amask)
        y = window_reverse(wins, w, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :wd]
        x = shortcut + y
        x = x + Mlp(int(c * self.mlp_ratio), name="mlp")(LayerNorm(name="norm2")(x))
        return x


class PatchMerging(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = LayerNorm(name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns [res2, res3, res4, res5] at strides 4/8/16/32."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    in_channels: int = 3

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), name="patch_embed")(x)
        y = LayerNorm(name="embed_norm")(y)
        feats = []
        dim = self.embed_dim
        for s, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(depth):
                y = SwinBlock(dim, heads, self.window,
                              shift=0 if i % 2 == 0 else self.window // 2,
                              name=f"stage{s}_block{i}")(y)
            feats.append(LayerNorm(name=f"out_norm{s}")(y))
            if s < len(self.depths) - 1:
                y = PatchMerging(name=f"merge{s}")(y)
                dim *= 2
        return feats
