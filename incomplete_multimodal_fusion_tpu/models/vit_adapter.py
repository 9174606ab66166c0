"""ViT-Adapter backbone variant
(reference downstream/*/modeling/multimae/multimae_big_adapter.py:1-482 +
adapter_modules.py:94-436): a convolutional SpatialPriorModule produces
multi-scale spatial priors; InteractionBlocks exchange information between
the ViT fusion stream and the priors through multi-scale deformable
attention (injector: priors -> tokens; extractor: tokens -> priors); the
enriched priors become the detection pyramid.

Built on the same MSDeformAttn core as the pixel decoder; the ViT here is
the incomplete-fusion encoder (ViTBaseline), interacting after each tap
layer.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import MaskInfo
from .layers import LayerNorm, Mlp
from .msda_module import MSDeformAttn
from .pixel_decoder import reference_points_for
from .vit_baseline import ViTBaseline


class SpatialPriorModule(nn.Module):
    """Conv stem -> priors at strides 4/8/16/32, projected to `dim`
    (adapter_modules.py SpatialPriorModule)."""

    dim: int
    stem_dim: int = 64

    @nn.compact
    def __call__(self, x):
        def conv_gn_relu(y, feats, strides, name):
            y = nn.Conv(feats, (3, 3), strides=(strides, strides), padding="SAME",
                        use_bias=False, name=name)(y)
            y = nn.GroupNorm(num_groups=min(32, feats), name=name + "_gn")(y)
            return nn.relu(y)

        y = conv_gn_relu(x, self.stem_dim, 2, "stem1")
        y = conv_gn_relu(y, self.stem_dim, 1, "stem2")
        c1 = nn.max_pool(y, (2, 2), strides=(2, 2))  # stride 4
        c2 = conv_gn_relu(c1, self.stem_dim * 2, 2, "conv2")  # stride 8
        c3 = conv_gn_relu(c2, self.stem_dim * 4, 2, "conv3")  # stride 16
        c4 = conv_gn_relu(c3, self.stem_dim * 4, 2, "conv4")  # stride 32
        proj = lambda t, name: nn.Conv(self.dim, (1, 1), name=name)(t)
        return [proj(c1, "fc1"), proj(c2, "fc2"), proj(c3, "fc3"), proj(c4, "fc4")]


def _deform_heads(dim: int, preferred: int = 6) -> int:
    for h in (preferred, 8, 4, 3, 2, 1):
        if dim % h == 0:
            return h
    return 1


class Injector(nn.Module):
    """tokens += gamma * MSDeformAttn(q=tokens, v=priors)
    (adapter_modules.py Injector)."""

    dim: int
    n_heads: int = 0  # 0 = auto
    n_points: int = 4

    @nn.compact
    def __call__(self, tokens, token_ref, priors_flat, prior_shapes):
        q = LayerNorm(name="query_norm")(tokens)
        v = LayerNorm(name="feat_norm")(priors_flat)
        heads = self.n_heads or _deform_heads(self.dim)
        attn = MSDeformAttn(self.dim, len(prior_shapes), heads,
                            self.n_points, name="attn")(q, token_ref, v, prior_shapes)
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        return tokens + gamma * attn


class Extractor(nn.Module):
    """priors += MSDeformAttn(q=priors, v=tokens-as-map) then FFN
    (adapter_modules.py Extractor)."""

    dim: int
    n_heads: int = 0  # 0 = auto
    n_points: int = 4

    @nn.compact
    def __call__(self, priors_flat, prior_ref, tokens, token_shape):
        q = LayerNorm(name="query_norm")(priors_flat)
        v = LayerNorm(name="feat_norm")(tokens)
        heads = self.n_heads or _deform_heads(self.dim)
        attn = MSDeformAttn(self.dim, 1, heads, self.n_points,
                            name="attn")(q, prior_ref, v, [token_shape])
        priors = priors_flat + attn
        priors = priors + Mlp(int(self.dim * 0.25), name="ffn")(
            LayerNorm(name="ffn_norm")(priors)
        )
        return priors


class ViTAdapterBaseline(nn.Module):
    """Fusion-ViT + adapter interactions; returns a 4-level pyramid whose
    channels are all dim_tokens (like the reference's adapter variant)."""

    in_domains: Tuple[str, ...] = ("s1", "s2", "dem")
    image_size: int = 256
    patch_size: int = 16
    dim_tokens: int = 192
    depth: int = 12
    dim_head: int = 64
    heads: int = 3
    num_fusion_tokens: int = 256
    prior_input: str = "s2"
    num_interactions: int = 4

    @nn.compact
    def __call__(
        self,
        x: Dict[str, jnp.ndarray],
        mask_info: MaskInfo,
        num_encoded_tokens: int,
        present: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        d = self.dim_tokens
        hp = self.image_size // self.patch_size  # fusion grid side (stride 16)
        vit = ViTBaseline(
            in_domains=self.in_domains, image_size=self.image_size,
            patch_size=self.patch_size, dim_tokens=d, depth=self.depth,
            dim_head=self.dim_head, heads=self.heads,
            num_fusion_tokens=self.num_fusion_tokens, name="vit",
        )
        # run the fusion encoder; its pyramid gives us the tapped fusion maps
        vit_feats = vit(x, mask_info, num_encoded_tokens, present=present,
                        deterministic=deterministic)
        # token stream for interactions = the stride-16 tap (identity level)
        tokens_map = vit_feats[2]  # [B, hp, hp, d]
        b = tokens_map.shape[0]
        tokens = tokens_map.reshape(b, hp * hp, d)

        priors = SpatialPriorModule(d, name="spm")(x[self.prior_input])
        prior_shapes = [(p.shape[1], p.shape[2]) for p in priors[1:]]  # strides 8/16/32
        priors_flat = jnp.concatenate(
            [p.reshape(b, -1, d) for p in priors[1:]], axis=1
        )

        token_shape = (hp, hp)
        token_ref = reference_points_for([token_shape])[None][..., :1, :]
        token_ref = jnp.broadcast_to(
            token_ref, (b, hp * hp, 1, 2)
        )
        token_ref_ms = jnp.broadcast_to(
            token_ref[:, :, :1, :], (b, hp * hp, len(prior_shapes), 2)
        )
        prior_ref = reference_points_for(prior_shapes)[None]
        prior_ref = jnp.broadcast_to(prior_ref, (b,) + prior_ref.shape[1:])[..., :1, :]

        for i in range(self.num_interactions):
            tokens = Injector(d, name=f"injector{i}")(
                tokens, token_ref_ms, priors_flat, prior_shapes
            )
            priors_flat = Extractor(d, name=f"extractor{i}")(
                priors_flat, prior_ref, tokens, token_shape
            )

        # split priors back to maps; add the ViT pyramid residually
        outs = []
        start = 0
        c1 = priors[0]
        up = jax.image.resize(
            priors_flat[:, : prior_shapes[0][0] * prior_shapes[0][1]].reshape(
                b, *prior_shapes[0], d
            ),
            c1.shape, method="bilinear",
        )
        outs.append(c1 + up)  # stride 4
        for (h_, w_) in prior_shapes:
            seg = priors_flat[:, start : start + h_ * w_].reshape(b, h_, w_, d)
            start += h_ * w_
            outs.append(seg)
        return [o + v for o, v in zip(outs, vit_feats)]
