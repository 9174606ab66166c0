"""ViT-Adapter building blocks
(reference downstream/*/modeling/multimae/multimae_big_adapter.py:1-482 +
adapter_modules.py:94-436): a convolutional SpatialPriorModule produces
multi-scale spatial priors; injector/extractor pairs exchange information
between the ViT fusion stream and the priors through multi-scale deformable
attention. The interactions are INTERLEAVED with the encoder block slices —
see ViTBaseline(adapter=True) in vit_baseline.py, which wraps each
interaction_groups slice with one injector/extractor pair
(multimae_big_adapter.py:311-314 semantics), so injected priors shape every
subsequent encoder layer.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, Mlp
from .msda_module import MSDeformAttn


class SpatialPriorModule(nn.Module):
    """Conv stem -> priors at strides 4/8/16/32, projected to `dim`
    (adapter_modules.py SpatialPriorModule)."""

    dim: int
    stem_dim: int = 64

    @nn.compact
    def __call__(self, x):
        def conv_gn_relu(y, feats, strides, name):
            # explicit (1,1), not SAME: torch Conv2d(k=3, p=1) pads both
            # sides at stride 2; SAME pads (0,1) (see models/resnet.py note)
            y = nn.Conv(feats, (3, 3), strides=(strides, strides),
                        padding=[(1, 1), (1, 1)],
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
