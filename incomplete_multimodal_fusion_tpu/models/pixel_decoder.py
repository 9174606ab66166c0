"""MSDeformAttn pixel decoder
(reference downstream/*/modeling/pixel_decoder/msdeformattn_vit.py):
deformable-DETR encoder over the 3 lowest-resolution backbone features plus
an FPN top-down step to the highest resolution, producing
(mask_features, transformer-ready multi-scale features).

NHWC throughout; no padding masks (TPU batches are uniform tiles), so valid
ratios are 1 and reference points are the static per-level center grid.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .msda_module import MSDeformAttn
from .position_encoding import position_embedding_sine


def reference_points_for(spatial_shapes: Sequence[Tuple[int, int]]):
    """Per-level pixel-center grids in [0,1], tiled to all levels
    (msdeformattn_vit.py:76-88 with valid_ratios == 1)."""
    pts = []
    for h, w in spatial_shapes:
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = jnp.concatenate(pts, 0)  # [S, 2]
    l = len(spatial_shapes)
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], l, 2))


class MSDeformAttnEncoderLayer(nn.Module):
    """Deformable self-attention + FFN, post-norm (msdeformattn_vit.py:27-67)."""

    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, deterministic=True):
        q = src + pos
        src2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, name="self_attn")(
            q, reference_points, src, spatial_shapes
        )
        src2 = nn.Dropout(self.dropout, deterministic=deterministic)(src2)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + src2)
        h = nn.Dense(self.d_ffn, kernel_init=nn.initializers.xavier_uniform(), name="linear1")(src)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(), name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + h)


class MSDeformAttnPixelDecoder(nn.Module):
    """(msdeformattn_vit.py:169-315). Input: 4 NHWC features res2..res5
    (high->low resolution). Output: (mask_features [B,H2,W2,mask_dim],
    multi_scale_features [3 x NHWC] low->high resolution)."""

    conv_dim: int = 256
    mask_dim: int = 256
    transformer_enc_layers: int = 2  # configs/maskformer_ake150.yaml:9-17
    n_heads: int = 8
    dim_feedforward: int = 1024
    n_points: int = 4
    dropout: float = 0.1
    # The reference FULL model runs TWO FPN steps (res3 then res2), because
    # MaskFormerModel_vit.py:92-94 labels the backbone strides 8..64 (the
    # true strides are 4..32) and num_fpn_levels = log2(min_stride) -
    # log2(common_stride) = 2. Faithfully reproduced (adapter_2/layer_2 ->
    # fpn_lateral2/fpn_output2); set 1 for the geometry-correct single step.
    num_fpn_levels: int = 2

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], deterministic: bool = True):
        # features: [res2, res3, res4, res5] NHWC, high -> low resolution
        assert len(features) == 4
        trans_feats = features[1:]  # res3..res5 feed the transformer
        # low -> high resolution order for input projections (res5 first)
        srcs, poss, shapes = [], [], []
        for idx, x in enumerate(trans_feats[::-1]):
            x = x.astype(jnp.float32)  # deformable attn runs fp32 (:278)
            h, w = x.shape[1], x.shape[2]
            s = nn.Dense(self.conv_dim, kernel_init=nn.initializers.xavier_uniform(),
                         name=f"input_proj{idx}")(x)
            s = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_gn{idx}")(s)
            pos = position_embedding_sine(h, w, self.conv_dim // 2)
            srcs.append(s.reshape(s.shape[0], h * w, self.conv_dim))
            poss.append(jnp.broadcast_to(pos.reshape(1, h * w, self.conv_dim), srcs[-1].shape))
            shapes.append((h, w))

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (len(srcs), self.conv_dim)
        )
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(
            [p + level_embed[i][None, None, :] for i, p in enumerate(poss)], axis=1
        )
        ref = reference_points_for(shapes)[None]
        ref = jnp.broadcast_to(ref, (src.shape[0],) + ref.shape[1:])

        for i in range(self.transformer_enc_layers):
            src = MSDeformAttnEncoderLayer(
                d_model=self.conv_dim, d_ffn=self.dim_feedforward,
                n_levels=len(shapes), n_heads=self.n_heads, n_points=self.n_points,
                dropout=self.dropout, name=f"enc_layer{i}",
            )(src, pos, ref, shapes, deterministic=deterministic)

        # split back to maps, low -> high resolution
        out = []
        start = 0
        for (h, w) in shapes:
            out.append(src[:, start : start + h * w].reshape(-1, h, w, self.conv_dim))
            start += h * w

        # FPN steps down to res2 (msdeformattn_vit.py:244-308). With
        # num_fpn_levels == 2 the first step laterals res3 (reference
        # adapter_2/layer_2 -> *2 names), then res2 (adapter_1 -> unsuffixed
        # names, kept for checkpoint compatibility with the 1-level layout).
        fpn_inputs = features[:self.num_fpn_levels][::-1]  # low -> high res
        for j, xf in enumerate(fpn_inputs):
            adapter_num = self.num_fpn_levels - j  # reference adapter index
            sfx = "" if adapter_num == 1 else str(adapter_num)
            xf = xf.astype(jnp.float32)
            lat = nn.Dense(self.conv_dim,
                           kernel_init=nn.initializers.xavier_uniform(),
                           name=f"fpn_lateral{sfx}")(xf)
            lat = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       name=f"fpn_lateral{sfx}_gn")(lat))
            up = jax.image.resize(
                out[-1], (out[-1].shape[0],) + xf.shape[1:3] + (self.conv_dim,),
                method="bilinear",
            )
            y = lat + up
            y = nn.Conv(self.conv_dim, (3, 3), padding="SAME",
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"fpn_output{sfx}")(y)
            y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     name=f"fpn_output{sfx}_gn")(y))
            out.append(y)

        mask_features = nn.Dense(
            self.mask_dim, kernel_init=nn.initializers.xavier_uniform(),
            name="mask_features",
        )(out[-1])
        # first 3 entries (low->high res) feed the transformer decoder
        return mask_features, out[:3]
