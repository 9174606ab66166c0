"""MaskFormer segmentation model
(reference downstream/*/modeling/MaskFormerModel_vit.py:22-105):
incomplete-fusion ViT backbone -> 4-level pyramid -> MSDeformAttn pixel
decoder -> Mask2Former query decoder -> {'pred_logits','pred_masks',
'aux_outputs'}.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import MaskInfo, full_visible_mask_info
from .mask2former_decoder import MultiScaleMaskedTransformerDecoder
from .pixel_decoder import MSDeformAttnPixelDecoder
from .vit_baseline import ViTBaseline


@dataclass(frozen=True)
class MaskFormerConfig:
    """Downstream model config (reference configs/maskformer_ake150.yaml +
    Base-segmention.yaml schema)."""

    in_domains: Tuple[str, ...] = ("s1", "s2", "dem")
    image_size: int = 256
    patch_size: int = 16
    num_classes: int = 1  # instance: building-only; semantic: land-cover K
    # backbone (tiny, MaskFormerModel_vit.py:756-795 factory)
    dim_tokens: int = 192
    depth: int = 12
    dim_head: int = 64
    heads: int = 3
    num_fusion_tokens: int = 256
    frozen_stages: int = 11
    fusion_mode: str = "crossattn"  # 'crossattn' | 'sup' (multimae_sup.py)
    # 'vit' = incomplete-fusion ViT (MaskFormerModel_vit.py);
    # 'resnet18/34/50/101/152' = CNN variant on a single input tensor
    # (MaskFormerModel.py:80-105 + backbone/resnet.py) with frozen BN stats
    backbone_type: str = "vit"
    resnet_input: str = "s2"
    # head (maskformer_ake150.yaml)
    conv_dim: int = 256
    mask_dim: int = 256
    transformer_enc_layers: int = 2
    # 2 = the reference full model's double FPN step (see pixel_decoder.py);
    # 1 = geometry-correct single step / pre-round-3 checkpoints
    num_fpn_levels: int = 2
    num_queries: int = 100
    dec_layers: int = 3
    dim_feedforward: int = 2048
    # 'mask2former' = MultiScaleMaskedTransformerDecoder (the reference
    # drivers' choice); 'standard' = the original DETR-style
    # StandardTransformerDecoder (maskformer_transformer_decoder.py:12-106)
    decoder_type: str = "mask2former"
    pre_norm: bool = False
    keep_ratio: float = 0.9  # train-time visible-token ratio (:576-580)

    @property
    def num_patches(self) -> int:
        n = self.image_size // self.patch_size
        return n * n

    @property
    def max_encoded_tokens(self) -> int:
        """Static packed size: ceil(keep_ratio * all tokens), 128-aligned
        (so E + num_fusion_tokens hits the Pallas q-tiled attention path —
        non-128-multiple lengths have no legal q-tile), clamped to the total
        token count."""
        total = self.num_patches * len(self.in_domains)
        e = int(self.keep_ratio * total)
        return min(((e + 127) // 128) * 128, total)


class MaskFormerModel(nn.Module):
    cfg: MaskFormerConfig

    @nn.compact
    def __call__(
        self,
        x: Dict[str, jnp.ndarray],
        mask_info: Optional[MaskInfo] = None,
        num_encoded_tokens: Optional[int] = None,
        present: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        c = self.cfg
        b = x[c.in_domains[0]].shape[0]
        if mask_info is None:  # eval: all tokens visible (:578-580 else-branch)
            mask_info = full_visible_mask_info(
                c.in_domains, (c.num_patches,) * len(c.in_domains), b
            )
            e = c.num_patches * len(c.in_domains)
        else:
            e = num_encoded_tokens or c.max_encoded_tokens

        if c.backbone_type.startswith("resnet"):
            from .resnet import ResNet

            depth = int(c.backbone_type[len("resnet"):])
            feats = ResNet(depth=depth, name="backbone")(x[c.resnet_input])
        elif c.backbone_type == "swin":
            from .swin import SwinTransformer

            feats = SwinTransformer(name="backbone")(x[c.resnet_input])
        elif c.backbone_type == "vit_adapter":
            feats = ViTBaseline(
                in_domains=c.in_domains, image_size=c.image_size,
                patch_size=c.patch_size, dim_tokens=c.dim_tokens,
                depth=c.depth, dim_head=c.dim_head, heads=c.heads,
                num_fusion_tokens=c.num_fusion_tokens, adapter=True,
                name="backbone",
            )(x, mask_info, e, present=present, deterministic=deterministic)
        else:
            backbone = ViTBaseline(
                in_domains=c.in_domains,
                image_size=c.image_size,
                patch_size=c.patch_size,
                dim_tokens=c.dim_tokens,
                depth=c.depth,
                dim_head=c.dim_head,
                heads=c.heads,
                num_fusion_tokens=c.num_fusion_tokens,
                fusion_mode=c.fusion_mode,
                name="backbone",
            )
            feats = backbone(x, mask_info, e, present=present, deterministic=deterministic)

        mask_features, ms_feats = MSDeformAttnPixelDecoder(
            conv_dim=c.conv_dim,
            mask_dim=c.mask_dim,
            transformer_enc_layers=c.transformer_enc_layers,
            num_fpn_levels=getattr(c, "num_fpn_levels", 2),
            name="pixel_decoder",
        )(feats, deterministic=deterministic)

        if getattr(c, "decoder_type", "mask2former") == "standard":
            from .maskformer_decoder import StandardTransformerDecoder

            return StandardTransformerDecoder(
                num_classes=c.num_classes,
                hidden_dim=c.conv_dim,
                num_queries=c.num_queries,
                dec_layers=c.dec_layers,
                dim_feedforward=c.dim_feedforward,
                mask_dim=c.mask_dim,
                pre_norm=c.pre_norm,
                name="predictor",
            )(ms_feats[0], mask_features)
        return MultiScaleMaskedTransformerDecoder(
            num_classes=c.num_classes,
            hidden_dim=c.conv_dim,
            num_queries=c.num_queries,
            dec_layers=c.dec_layers,
            dim_feedforward=c.dim_feedforward,
            mask_dim=c.mask_dim,
            name="predictor",
        )(ms_feats, mask_features)
