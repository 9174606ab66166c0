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
    # ViT-Adapter (multimae_big_adapter.py:240-330 + adapter_modules.py):
    # SpatialPriorModule priors exchange information with the FUSION stream
    # through injector/extractor interactions wrapped around encoder block
    # slices — the injected priors influence every later encoder layer
    # (interaction_indexes semantics, multimae_big_adapter.py:311-314)
    adapter: bool = False
    adapter_prior_input: str = "s2"
    adapter_heads: int = 0  # 0 = auto
    adapter_points: int = 4

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

    @property
    def interaction_groups(self):
        """Block slices [(start, end)] each wrapped by one injector/extractor
        pair (multimae_big_adapter.py interaction_indexes, :311-314)."""
        ends = sorted(set(self.tap_layers))
        out, prev = [], -1
        for e_ in ends:
            out.append((prev + 1, e_))
            prev = e_
        return out

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
        if self.adapter:
            from .vit_adapter import Extractor, Injector, SpatialPriorModule

            self.spm = SpatialPriorModule(self.dim_tokens, name="spm")
            n_int = len(self.interaction_groups)
            self.injectors = [
                Injector(self.dim_tokens, self.adapter_heads,
                         self.adapter_points, name=f"injector{i}")
                for i in range(n_int)
            ]
            self.extractors = [
                Extractor(self.dim_tokens, self.adapter_heads,
                          self.adapter_points, name=f"extractor{i}")
                for i in range(n_int)
            ]
            # 3-level prior embedding + c1 top-up (multimae_big_adapter.py:
            # 250 level_embed, 262 self.up)
            self.adapter_level_embed = self.param(
                "adapter_level_embed", trunc_normal_init(0.02),
                (3, self.dim_tokens),
            )
            self.adapter_up = nn.ConvTranspose(
                self.dim_tokens, (2, 2), strides=(2, 2), name="adapter_up",
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            )

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
        use_pallas = resolve_attn_mode(self.attn_impl, e + f, self.heads * self.dim_head)
        # fusion-stack plane validity: absent modality planes are excluded
        # (reference drops them from the stack entirely, :645-655)
        plane_valid = jnp.concatenate([present, jnp.ones((1,), bool)])  # [T+1]

        slot = mask_info.ids_restore
        use = (slot < e) & (slot < mask_info.num_visible[:, None])
        onehot = ((slot[..., None] == jnp.arange(e, dtype=slot.dtype))
                  & use[..., None]).astype(dtype)

        # ViT-Adapter priors (multimae_big_adapter.py:296-302): conv stem
        # pyramid + level embedding, flattened for the deformable interactions
        if self.adapter:
            from .pixel_decoder import reference_points_for

            priors = self.spm(x[self.adapter_prior_input].astype(dtype))
            c1 = priors[0]  # stride 4
            cs = [
                p + self.adapter_level_embed[i][None, None, None].astype(dtype)
                for i, p in enumerate(priors[1:])
            ]
            prior_shapes = [(p.shape[1], p.shape[2]) for p in cs]
            priors_flat = jnp.concatenate(
                [p.reshape(b, -1, self.dim_tokens) for p in cs], axis=1
            )
            token_shape = (hp, hp)
            tok_ref = reference_points_for([token_shape])[:, :1, :]  # [F,1,2]
            tok_ref_ms = jnp.broadcast_to(
                tok_ref[None], (b, f, 1, 2)
            )
            tok_ref_ms = jnp.broadcast_to(
                tok_ref_ms[:, :, :1, :], (b, f, len(prior_shapes), 2)
            )
            prior_ref = reference_points_for(prior_shapes)[:, :1, :]
            prior_ref = jnp.broadcast_to(
                prior_ref[None], (b, prior_ref.shape[0], 1, 2)
            )
            group_of_start = {s: gi for gi, (s, _) in enumerate(self.interaction_groups)}
            group_of_end = {e_: gi for gi, (_, e_) in enumerate(self.interaction_groups)}
        else:
            group_of_start = group_of_end = {}

        mask_emb = self.mask_embedding.astype(dtype)
        fusion_outs = []
        for i, blk in enumerate(self.blocks):
            if self.adapter and i in group_of_start:
                # inject priors INTO the fusion stream before this block
                # slice, so they shape all subsequent encoder computation
                # (InteractionBlock order, adapter_modules.py:181-196)
                gi = group_of_start[i]
                fus_inj = self.injectors[gi](
                    tokens[:, e:, :], tok_ref_ms, priors_flat, prior_shapes
                )
                tokens = jnp.concatenate([tokens[:, :e, :], fus_inj], axis=1)
            fusion_new = self.fus_blocks[i](
                tokens[:, :e, :], tokens[:, e:, :], mask_emb, onehot, use,
                plane_valid=plane_valid, use_pallas=use_pallas,
            )
            tokens = jnp.concatenate([tokens[:, :e, :], fusion_new], axis=1)
            tokens = blk(
                tokens, packed_types=types_padded, fusion_type=self.fusion_type,
                use_pallas=use_pallas, deterministic=deterministic,
            )
            fusion_outs.append(tokens[:, e:, :])
            if self.adapter and i in group_of_end:
                gi = group_of_end[i]
                priors_flat = self.extractors[gi](
                    priors_flat, prior_ref,
                    tokens[:, e:, :], token_shape,
                )

        feats = []
        for tap in self.tap_layers:
            o = self.norm(fusion_outs[tap])
            feats.append(o.reshape(b, hp, hp, self.dim_tokens))
        vit_pyr = self.pyramid(*feats)
        if not self.adapter:
            return vit_pyr

        # split enriched priors back into maps; c1 = up(c2) + c1; add the
        # ViT pyramid (add_vit_feature, multimae_big_adapter.py:318-330)
        start = 0
        c_maps = []
        for (h_, w_) in prior_shapes:
            c_maps.append(
                priors_flat[:, start : start + h_ * w_].reshape(b, h_, w_, -1)
            )
            start += h_ * w_
        c1 = self.adapter_up(c_maps[0]) + c1
        outs = [c1] + c_maps
        return [o + v for o, v in zip(outs, vit_pyr)]

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

