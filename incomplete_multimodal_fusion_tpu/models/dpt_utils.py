"""DPT / ConvNeXt dense-prediction head utilities (flax, NHWC).

Functional equivalents of the reference's
``pretraining/multimae/output_adapter_utils.py`` (ConvNeXtBlock :19-57,
ResidualConvUnit_custom :60-123, make_scratch :125-180,
FeatureFusionBlock_custom :182-243, Interpolate :245-276). In the reference
these are dead code — no driver ever builds a DPT adapter — but they are
part of the published surface, so the rebuild provides working TPU-native
equivalents plus a small composed ``DPTHead`` that exercises them
end-to-end (the refinenet composition follows the standard DPT recipe the
utilities exist for).

TPU notes: everything is NHWC (XLA's native conv layout). The reference's
fusion blocks interpolate with ``align_corners=True`` (:241, :253) — a
semantics jax.image.resize does not offer — so resizes here are exact
separable interpolation matrices applied as two einsums (A_h @ x @ A_w^T
with A[i, j] = hat(i*(in-1)/(out-1) - j)), which is also the MXU-friendly
formulation. BatchNorm is intentionally not offered — the reference only
ever constructs these blocks with bn=False via make_fusion_block
(:245-253).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm


def _interp_matrix(n_out: int, n_in: int, align_corners: bool) -> jnp.ndarray:
    """[n_out, n_in] 1-D linear interpolation matrix (torch semantics)."""
    if n_in == 1 or n_out == 1:
        src = np.zeros(n_out)
    elif align_corners:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        src = np.clip(src, 0, n_in - 1)
    w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - np.arange(n_in)[None, :]))
    return jnp.asarray(w / w.sum(axis=1, keepdims=True), jnp.float32)


def _resize_bilinear(x, nh, nw, align_corners=True):
    """NHWC bilinear resize as two interpolation-matrix einsums."""
    b, h, w, c = x.shape
    ah = _interp_matrix(nh, h, align_corners).astype(x.dtype)
    aw = _interp_matrix(nw, w, align_corners).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", ah, x)
    return jnp.einsum("pw,bowc->bopc", aw, x)


class Interpolate(nn.Module):
    """Bilinear up/down-sampling by a static scale factor (:255-276);
    ``align_corners`` matches the reference call sites (fusion blocks pass
    True, the standalone Interpolate defaults False)."""

    scale_factor: float = 2.0
    align_corners: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        nh = int(round(h * self.scale_factor))
        nw = int(round(w * self.scale_factor))
        return _resize_bilinear(x, nh, nw, self.align_corners)


class ConvNeXtBlock(nn.Module):
    """Depthwise 7x7 conv -> LN -> pointwise 4x MLP (+ layer scale)
    (:19-57; isotropic variant, layer scale disabled by default)."""

    dim: int
    layer_scale_init_value: float = 0.0

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    name="dwconv")(x)
        x = LayerNorm(eps=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda k, s: jnp.full(s, self.layer_scale_init_value),
                (self.dim,),
            )
            x = gamma * x
        return inp + x


class ResidualConvUnit(nn.Module):
    """ReLU -> 3x3 conv -> ReLU -> 3x3 conv + skip (:60-123, bn=False)."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """DPT refinenet fusion: optional lateral residual unit, residual unit,
    2x bilinear upsample, 1x1 out conv (:182-243)."""

    features: int

    @nn.compact
    def __call__(self, x, lateral=None):
        if lateral is not None:
            x = x + ResidualConvUnit(self.features, name="res_unit1")(lateral)
        x = ResidualConvUnit(self.features, name="res_unit2")(x)
        # align_corners=True per the reference fusion block (:241)
        x = Interpolate(2.0, align_corners=True, name="up")(x)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class Scratch(nn.Module):
    """Per-level 3x3 projection convs into a common width (:125-180,
    expand=False — the only configuration the reference composes)."""

    out_features: int

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        return tuple(
            nn.Conv(self.out_features, (3, 3), padding=1, use_bias=False,
                    name=f"layer{i + 1}_rn")(f)
            for i, f in enumerate(feats)
        )


class DPTHead(nn.Module):
    """Standard DPT composition of the utilities: project a 4-level pyramid
    to a common width, refine coarse-to-fine with FeatureFusionBlocks, and
    regress a dense map. The reference ships the parts but never wires
    them; this is the canonical wiring they exist for."""

    features: int = 256
    out_channels: int = 1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """feats: 4 NHWC maps, finest first (strides 4/8/16/32-style)."""
        assert len(feats) == 4
        l1, l2, l3, l4 = Scratch(self.features, name="scratch")(feats)
        x = FeatureFusionBlock(self.features, name="refine4")(l4)
        x = FeatureFusionBlock(self.features, name="refine3")(x, _match(l3, x))
        x = FeatureFusionBlock(self.features, name="refine2")(x, _match(l2, x))
        x = FeatureFusionBlock(self.features, name="refine1")(x, _match(l1, x))
        x = nn.Conv(self.features // 2, (3, 3), padding=1, name="head_conv1")(x)
        x = Interpolate(2.0, align_corners=True, name="head_up")(x)
        x = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), name="head_out")(x)


def _match(lateral: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Resize a lateral feature to x's spatial shape (refinenet inputs come
    from different pyramid strides)."""
    if lateral.shape[1:3] == x.shape[1:3]:
        return lateral
    return _resize_bilinear(lateral, x.shape[1], x.shape[2], align_corners=True)
