"""Input / output adapters (reference pretraining/multimae/input_adapters.py
and output_adapters_simple.py), re-expressed for TPU.

Patchify is a reshape + one matmul instead of a strided conv (same linear
map, MXU-friendly). Images are NHWC (TPU-native), where the reference uses
NCHW.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.patches import conv_patch_embed, unpatchify
from ..ops.posemb import build_2d_sincos_posemb, resize_posemb
from .layers import LayerNorm, Mlp, ViTBlock, trunc_normal_init


class PatchedInputAdapter(nn.Module):
    """Patchify + fixed 2D sin-cos posemb (input_adapters.py:27-119).

    Input [B, H, W, C] -> tokens [B, N_H*N_W, dim].
    """

    num_channels: int
    patch_size: int = 16
    image_size: int = 256
    stride_level: int = 1
    sincos_pos_emb: bool = True
    learnable_pos_emb: bool = False

    @property
    def p(self) -> int:
        return max(1, self.patch_size // self.stride_level)

    @property
    def num_patches(self) -> int:
        n = self.image_size // self.patch_size
        return n * n

    @nn.compact
    def __call__(self, x, dim_tokens: Optional[int] = None):
        p = self.p
        dim = dim_tokens
        kernel = self.param(
            "proj_kernel", nn.initializers.xavier_uniform(),
            (p * p * self.num_channels, dim)
        )
        bias = self.param("proj_bias", nn.initializers.zeros, (dim,))
        if x.ndim == 3:
            # patch-major input [B, N, p*p*C] (pixel order (ph, pw, c), the
            # ops.patches.patchify layout): the host loader already emitted
            # MXU-ready patches, so the embedding is a single matmul with no
            # device-side 6-D transpose copies (round-4 step profile:
            # ~0.2 ms of input patchify layout copies at the flagship shape)
            b, n, pc = x.shape
            assert pc == p * p * self.num_channels, (
                f"adapter expects patch dim {p * p * self.num_channels}, "
                f"got {pc} (input {x.shape})"
            )
            n_h = n_w = int(round(n ** 0.5))
            assert n_h * n_w == n, f"patch-major input needs a square grid, got N={n}"
            tokens = x @ kernel.astype(x.dtype) + bias.astype(x.dtype)
        else:
            b, h, w, c = x.shape
            assert c == self.num_channels, (
                f"adapter expects {self.num_channels} channels, got {c} (input {x.shape})"
            )
            n_h, n_w = h // p, w // p
            tokens = conv_patch_embed(x, kernel.astype(x.dtype), bias.astype(x.dtype), p)

        hp = self.image_size // (self.stride_level * p)
        if self.sincos_pos_emb and not self.learnable_pos_emb:
            pos = build_2d_sincos_posemb(hp, hp, dim)
        else:
            pos = self.param("pos_emb", trunc_normal_init(0.02), (hp * hp, dim))
        pos = resize_posemb(pos, (hp, hp), (n_h, n_w)).astype(x.dtype)
        return tokens + pos[None]


class SemSegInputAdapter(nn.Module):
    """Class-embedding + patchify adapter for semantic-map modalities like the
    Dynamic-World 'dnw' input (input_adapters.py:209-328)."""

    num_classes: int
    patch_size: int = 16
    image_size: int = 256
    stride_level: int = 1
    dim_class_emb: int = 64

    @property
    def p(self) -> int:
        return max(1, self.patch_size // self.stride_level)

    @nn.compact
    def __call__(self, x, dim_tokens: Optional[int] = None):
        # x: [B, H, W] int class ids
        b, h, w = x.shape
        p = self.p
        n_h, n_w = h // p, w // p
        dim = dim_tokens
        class_emb = self.param(
            "class_emb", trunc_normal_init(0.02), (self.num_classes, self.dim_class_emb)
        )
        emb = jnp.take(class_emb, x, axis=0)  # [B, H, W, dim_class_emb]
        kernel = self.param(
            "proj_kernel",
            nn.initializers.xavier_uniform(),
            (p * p * self.dim_class_emb, dim),
        )
        bias = self.param("proj_bias", nn.initializers.zeros, (dim,))
        tokens = conv_patch_embed(emb, kernel, bias, p)
        hp = self.image_size // (self.stride_level * p)
        pos = build_2d_sincos_posemb(hp, hp, dim)
        pos = resize_posemb(pos, (hp, hp), (n_h, n_w))
        return tokens + pos[None].astype(tokens.dtype)


def fusion_posemb(num_fusion_tokens: int, dim: int, image_size: int, patch_size: int):
    """FusionInputAdapter (input_adapters.py:121-206): adds the same fixed
    2D sin-cos posemb to the learned fusion tokens, no projection."""
    hp = image_size // patch_size
    assert hp * hp == num_fusion_tokens, "fusion tokens must tile the patch grid"
    return build_2d_sincos_posemb(hp, hp, dim)  # [F, dim]


class SpatialOutputAdapterFull(nn.Module):
    """Full MAE-style decoder (reference output_adapters.py:60-282 and its
    byte-identical output_adapters_fusion.py): mask-token unshuffle via
    ids_restore, per-task + positional context embeddings, task-query
    extraction, cross-attention to the visible context, then self-attention
    layers and un-patchify.

    Static-shape form: the unshuffle is a one-hot matmul over the packed
    layout and padded packed slots are excluded from the cross-attention
    with a key mask (the reference's gather simply never includes them).
    """

    num_channels: int
    task: str
    context_tasks: Tuple[str, ...]
    patch_size: int = 16
    image_size: int = 256
    stride_level: int = 1
    dim_tokens: int = 256
    depth: int = 2
    num_heads: int = 8
    use_task_queries: bool = True
    use_xattn: bool = True

    @property
    def p(self) -> int:
        return max(1, self.patch_size // self.stride_level)

    @nn.compact
    def __call__(self, encoder_tokens, mask_info, num_encoded_tokens: int,
                 patch_output: bool = False):
        from ..ops.masking import MaskInfo  # noqa: F401 (doc)
        from .layers import ViTCrossAttention

        b, e_slots, _ = encoder_tokens.shape
        e = num_encoded_tokens
        p = self.p
        n_hw = self.image_size // (self.stride_level * p)
        f = n_hw * n_hw
        t = len(self.context_tasks)
        d = self.dim_tokens

        ctx = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(),
                       name="proj_context")(encoder_tokens)  # [B, E, d]

        # unshuffle into the full T*F grid, mask_token at masked positions
        # (output_adapters.py:190-201) — one-hot matmul form
        slot = mask_info.ids_restore
        use = (slot < e) & (slot < mask_info.num_visible[:, None])
        onehot = ((slot[..., None] == jnp.arange(e, dtype=slot.dtype))
                  & use[..., None]).astype(ctx.dtype)  # [B, T*F, E]
        mask_token = self.param("mask_token", nn.initializers.zeros, (1, 1, d))
        grid = jnp.einsum("bge,bed->bgd", onehot, ctx)
        grid = grid + jnp.where(use[..., None], 0, mask_token.astype(ctx.dtype))

        # context embeddings: per-task embedding + 2D posemb per section
        # (output_adapters.py:160-181)
        pos = build_2d_sincos_posemb(n_hw, n_hw, d)
        embs = []
        for tk in self.context_tasks:
            te = self.param(f"task_emb_{tk}", trunc_normal_init(0.02), (1, 1, d))
            embs.append(te + pos[None])
        emb = jnp.concatenate(embs, axis=1).astype(ctx.dtype)  # [1, T*F, d]
        grid = grid + emb

        # queries: this task's section (output_adapters.py:208-216)
        ti = self.context_tasks.index(self.task) if self.task in self.context_tasks else 0
        if self.use_task_queries and self.task in self.context_tasks:
            queries = grid[:, ti * f : (ti + 1) * f]
        else:
            queries = (mask_token + pos[None]).astype(ctx.dtype)
            queries = jnp.broadcast_to(queries, (b, f, d))

        # visible context = embedded grid gathered back to packed slots
        # (output_adapters.py:225-227); padded slots masked out of attention
        context = jnp.einsum("bge,bgd->bed", onehot, grid)
        key_valid = (jnp.arange(e)[None] < mask_info.num_visible[:, None])

        if self.use_xattn:
            x = ViTCrossAttention(self.num_heads, qkv_bias=True, name="decoder")(
                LayerNorm(eps=1e-6, name="query_norm")(queries),
                LayerNorm(eps=1e-6, name="context_norm")(context),
                attn_mask=key_valid[:, None, None, :],
            )
            x = x + Mlp(int(d * 4), name="mlp")(LayerNorm(eps=1e-6, name="out_norm")(x))
        else:
            x = queries

        for i in range(self.depth):
            x = ViTBlock(num_heads=self.num_heads, qkv_bias=True, norm_eps=1e-6,
                         name=f"block{i}")(x)
        x = nn.Dense(self.num_channels * p * p,
                     kernel_init=nn.initializers.xavier_uniform(), name="out_proj")(x)
        if patch_output:
            # patch-layout [B, F, p*p*C] — the patch-space losses consume this
            # directly; the pixel unpatchify then dead-code-eliminates out of
            # the train step (losses/masked.py patch variants)
            return x
        return unpatchify(x, p, n_hw, n_hw, self.num_channels)


class SpatialOutputAdapter(nn.Module):
    """Per-task reconstruction decoder over the fusion-token grid
    (output_adapters_simple.py:33-188, the class used by all three pretrain
    drivers, pretrain_mmae.py:39).

    encoder fusion tokens [B, F, enc_dim] -> image [B, H, W, C]:
      proj_context -> +task embedding -> depth x ViT blocks -> out_proj ->
      un-patchify. No mask-token unshuffle: the queries ARE the fusion grid.
    """

    num_channels: int
    patch_size: int = 16
    image_size: int = 256
    stride_level: int = 1
    dim_tokens: int = 256
    depth: int = 2
    num_heads: int = 8
    qkv_bias: bool = True

    @property
    def p(self) -> int:
        return max(1, self.patch_size // self.stride_level)

    @nn.compact
    def __call__(self, encoder_tokens: jnp.ndarray, image_size: Optional[Tuple[int, int]] = None,
                 use_pallas=False, trunk_only=False, patch_output=False):
        h, w = image_size or (self.image_size, self.image_size)
        p = self.p
        n_h = h // (self.stride_level * p)
        n_w = w // (self.stride_level * p)

        x = nn.Dense(
            self.dim_tokens, kernel_init=nn.initializers.xavier_uniform(), name="proj_context"
        )(encoder_tokens)
        task_emb = self.param("task_emb", trunc_normal_init(0.02), (1, 1, self.dim_tokens))
        x = x + task_emb.astype(x.dtype)
        for i in range(self.depth):
            x = ViTBlock(
                num_heads=self.num_heads, qkv_bias=self.qkv_bias, norm_eps=1e-6, name=f"block{i}"
            )(x, use_pallas=use_pallas)
        if trunk_only:
            # task-generic part only (proj/emb/blocks share shapes across
            # tasks) — MultiMAE._decode_simple batches it over tasks and
            # applies the per-task out_proj itself
            return x
        x = nn.Dense(
            self.num_channels * p * p,
            kernel_init=nn.initializers.xavier_uniform(),
            name="out_proj",
        )(x)
        if patch_output:
            return x
        return unpatchify(x, p, n_h, n_w, self.num_channels)
