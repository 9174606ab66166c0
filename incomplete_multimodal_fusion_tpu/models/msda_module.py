"""MSDeformAttn module (reference downstream/*/modeling/pixel_decoder/ops/
modules/ms_deform_attn.py:34-120): offset/weight linears around the
deformable sampling core, with the directional-grid offset-bias init
(:66-80). NHWC / flattened [B, S, C] layout.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.msda import ms_deform_attn_core


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional grid init (ms_deform_attn.py:66-74): head h points along
    angle 2*pi*h/H, scaled by (point index + 1)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttn(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    # 'auto' = Pallas hat-matmul kernel when lowered for TPU, XLA gather core
    # elsewhere; 'pallas' / 'xla' force one side (ops/pallas_msda.py)
    impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, C]
        reference_points: jnp.ndarray,  # [B, Lq, L, 2] in [0, 1]
        input_flatten: jnp.ndarray,  # [B, S, C]
        spatial_shapes: Sequence[Tuple[int, int]],  # static
    ) -> jnp.ndarray:
        b, lq, _ = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                         name="value_proj")(input_flatten)
        value = value.reshape(b, -1, m, d)

        offsets = nn.Dense(
            m * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(m, l, p),
            name="sampling_offsets",
        )(query).reshape(b, lq, m, l, p, 2)
        weights = nn.Dense(
            m * l * p, kernel_init=nn.initializers.zeros, name="attention_weights"
        )(query).reshape(b, lq, m, l * p)
        weights = nn.softmax(weights, axis=-1).reshape(b, lq, m, l, p)

        # normalize offsets by level (w, h) (ms_deform_attn.py:108-110)
        normalizer = jnp.asarray(
            [[w_, h_] for h_, w_ in spatial_shapes], jnp.float32
        )  # [L, 2] as (w, h)
        locs = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        if self.impl == "pallas":
            from ..ops.pallas_msda import ms_deform_attn_pallas

            out = ms_deform_attn_pallas(value, tuple(spatial_shapes), locs, weights)
        elif self.impl == "auto":
            from ..ops.pallas_msda import ms_deform_attn_auto

            out = ms_deform_attn_auto(value, tuple(spatial_shapes), locs, weights)
        else:
            out = ms_deform_attn_core(value, tuple(spatial_shapes), locs, weights)
        return nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                        name="output_proj")(out)
