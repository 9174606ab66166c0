"""Downstream incomplete-fusion ViT backbone
(reference downstream/instance_segmentation/modeling/multimae/multimae_big_imcomplete.py).

Same fusion-token encoder as pretraining, but:
  * train-time random modality subsets (`present`; reference samples a python
    random subset per step, :542-548 — here the subset is a traced bool
    vector so dropout patterns never recompile);
  * visible-token ratio `keep_ratio` (0.9) over present tokens (:576-580);
  * absent modalities are removed from the per-position fusion stack
    (reference simply doesn't append their plane, :645-655 — here the plane
    is masked out of the fusion attention via key_valid);
  * the fusion stream is tapped at 4 depths (`flags` = every depth//4,
    :428, :661-662), layer-normed, reshaped to the fusion grid and expanded
    into a 4-level pyramid: 4x (ConvT-GN-GELU-ConvT), 2x ConvT, identity,
    0.5x maxpool (:432-445, :666-680).

Param names match MultiMAE so pretraining checkpoints restore non-strict
(reference init_weights/load_state_dict :447-460).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import modalities as modreg
from ..ops.attention import packed_token_types, packed_valid
from ..ops.masking import MaskInfo
from ..ops.pallas_attn import PAD_TYPE, resolve_attn_mode
from ..ops.posemb import build_2d_sincos_posemb
from .adapters import PatchedInputAdapter, SemSegInputAdapter
from .layers import BiaslessLayerNorm, EncoderBlock, FusionBlockFast, trunc_normal_init


class FeaturePyramid(nn.Module):
    """up1..up4 pyramid (multimae_big_imcomplete.py:432-445)."""

    dim: int

    @nn.compact
    def __call__(self, f1, f2, f3, f4):
        # f*: [B, H, W, D]
        d = self.dim
        ct = lambda name: nn.ConvTranspose(
            d, (2, 2), strides=(2, 2), name=name,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        x1 = ct("up1_conv1")(f1)
        x1 = nn.GroupNorm(num_groups=32, name="up1_gn")(x1)
        x1 = jax.nn.gelu(x1, approximate=False)
        x1 = ct("up1_conv2")(x1)
        x2 = ct("up2_conv")(f2)
        x3 = f3
        x4 = nn.max_pool(f4, (2, 2), strides=(2, 2))
        return [x1, x2, x3, x4]


class ViTBaseline(nn.Module):
    in_domains: Tuple[str, ...] = ("s1", "s2", "dem")
    image_size: int = 256
    patch_size: int = 16
    dim_tokens: int = 192
    depth: int = 12
    dim_head: int = 64
    heads: int = 3
    ff_mult: int = 4
    num_fusion_tokens: int = 256
    attn_impl: str = "auto"
    # 'crossattn' = fusion-token stream + per-layer fusion blocks (flagship);
    # 'sup' = supervised baseline without a fusion stream (multimae_sup.py:
    # full-attention blocks over all tokens, posemb'd return tokens
    # attention-pool the final tokens, replicated across the 4 taps)
    fusion_mode: str = "crossattn"

    @property
    def num_patches(self) -> int:
        n = self.image_size // self.patch_size
        return n * n

    @property
    def fusion_type(self) -> int:
        return len(self.in_domains)

    @property
    def tap_layers(self):
        # [i for i in range(-1, depth, depth//4)][1:] (multimae_big_imcomplete.py:428)
        step = max(self.depth // 4, 1)
        taps = [i for i in range(-1, self.depth, step)][1:]
        taps = taps[-4:]
        return [taps[0]] * (4 - len(taps)) + taps  # pad for shallow test nets

    def setup(self):
        specs = {d: modreg.get(d) for d in self.in_domains}
        in_ad = {}
        for d, spec in specs.items():
            if spec.adapter == "semseg":
                in_ad[d] = SemSegInputAdapter(
                    num_classes=spec.num_classes, patch_size=self.patch_size,
                    image_size=self.image_size, stride_level=spec.stride_level,
                    dim_class_emb=spec.dim_class_emb, name=f"input_adapter_{d}",
                )
            else:
                in_ad[d] = PatchedInputAdapter(
                    num_channels=spec.num_channels, patch_size=self.patch_size,
                    image_size=self.image_size, stride_level=spec.stride_level,
                    name=f"input_adapter_{d}",
                )
        self.input_adapters = in_ad
        self.blocks = [
            EncoderBlock(dim_head=self.dim_head, heads=self.heads,
                         ff_mult=self.ff_mult, name=f"block{i}")
            for i in range(self.depth)
        ]
        if self.fusion_mode == "crossattn":
            self.fusion_tokens = self.param(
                "fusion_tokens", trunc_normal_init(0.02),
                (1, self.num_fusion_tokens, self.dim_tokens),
            )
            self.mask_embedding = self.param(
                "mask_embedding", nn.initializers.zeros,
                (1, self.num_fusion_tokens, self.dim_tokens),
            )
            self.fus_blocks = [
                FusionBlockFast(dim_head=self.dim_head, heads=self.heads,
                                ff_mult=self.ff_mult, name=f"fus_block{i}")
                for i in range(self.depth)
            ]
        else:  # 'sup' (multimae_sup.py:78-85)
            from .layers import Mlp, ZorroAttention

            self.return_tokens = self.param(
                "return_tokens", trunc_normal_init(0.02),
                (1, self.num_fusion_tokens, self.dim_tokens),
            )
            self.attn_pool = ZorroAttention(
                dim_head=self.dim_head, heads=self.heads, name="attn_pool"
            )
            self.mlp = Mlp(hidden_features=self.dim_tokens * 4, name="mlp")
        self.norm = BiaslessLayerNorm(name="norm")
        self.pyramid = FeaturePyramid(self.dim_tokens, name="pyramid")

    def __call__(
        self,
        x: Dict[str, jnp.ndarray],
        mask_info: MaskInfo,
        num_encoded_tokens: int,
        present: Optional[jnp.ndarray] = None,  # [T] bool, default all
        deterministic: bool = True,
    ):
        e = num_encoded_tokens
        f = self.num_fusion_tokens
        t_mod = len(self.in_domains)
        b = x[self.in_domains[0]].shape[0]
        if present is None:
            present = jnp.ones((t_mod,), bool)

        input_task_tokens = {
            d: self.input_adapters[d](x[d], dim_tokens=self.dim_tokens)
            for d in self.in_domains
        }
        dtype = input_task_tokens[self.in_domains[0]].dtype

        if self.fusion_mode == "sup":
            return self._forward_sup(input_task_tokens, b, dtype, deterministic)

        hp = self.image_size // self.patch_size
        fus_pos = build_2d_sincos_posemb(hp, hp, self.dim_tokens)
        fusion_tokens = (self.fusion_tokens + fus_pos[None]).astype(dtype)
        fusion_tokens = jnp.broadcast_to(fusion_tokens, (b, f, self.dim_tokens))

        full = jnp.concatenate([input_task_tokens[d] for d in self.in_domains], axis=1)
        keep = mask_info.order[:, :e]
        packed = jnp.take_along_axis(full, keep[..., None], axis=1)
        tokens = jnp.concatenate([packed, fusion_tokens], axis=1)

        nums = tuple(self.num_patches for _ in self.in_domains)
        types = packed_token_types(mask_info.order, nums, e, f, self.fusion_type)
        valid = packed_valid(mask_info.num_visible, e, f)
        types_padded = jnp.where(valid, types, PAD_TYPE)
        use_pallas = resolve_attn_mode(self.attn_impl, e + f)
        # fusion-stack plane validity: absent modality planes are excluded
        # (reference drops them from the stack entirely, :645-655)
        plane_valid = jnp.concatenate([present, jnp.ones((1,), bool)])  # [T+1]

        slot = mask_info.ids_restore
        use = (slot < e) & (slot < mask_info.num_visible[:, None])
        onehot = ((slot[..., None] == jnp.arange(e, dtype=slot.dtype))
                  & use[..., None]).astype(dtype)

        mask_emb = self.mask_embedding.astype(dtype)
        fusion_outs = []
        for i, blk in enumerate(self.blocks):
            fusion_new = self.fus_blocks[i](
                tokens[:, :e, :], tokens[:, e:, :], mask_emb, onehot, use,
                plane_valid=plane_valid,
            )
            tokens = jnp.concatenate([tokens[:, :e, :], fusion_new], axis=1)
            tokens = blk(
                tokens, packed_types=types_padded, fusion_type=self.fusion_type,
                use_pallas=use_pallas, deterministic=deterministic,
            )
            fusion_outs.append(tokens[:, e:, :])

        feats = []
        for tap in self.tap_layers:
            o = self.norm(fusion_outs[tap])
            feats.append(o.reshape(b, hp, hp, self.dim_tokens))
        return self.pyramid(*feats)

    def _forward_sup(self, input_task_tokens, b, dtype, deterministic):
        """Supervised baseline (multimae_sup.py:315-357): full-attention
        blocks over all modality tokens, posemb'd return tokens pool the
        final stream, replicated across the 4 pyramid taps."""
        hp = self.image_size // self.patch_size
        tokens = jnp.concatenate(
            [input_task_tokens[d] for d in self.in_domains], axis=1
        )
        for blk in self.blocks:
            tokens = blk(tokens, deterministic=deterministic)
        pos = build_2d_sincos_posemb(hp, hp, self.dim_tokens)
        ret = (self.return_tokens + pos[None]).astype(dtype)
        ret = jnp.broadcast_to(ret, (b, self.num_fusion_tokens, self.dim_tokens))
        ret = self.attn_pool(ret, context=tokens)
        ret = ret + self.mlp(self.norm(ret))
        feat = self.norm(ret).reshape(b, hp, hp, self.dim_tokens)
        return self.pyramid(feat, feat, feat, feat)

