"""MultiMAE incomplete-multimodal fusion encoder (flagship model).

TPU-native re-design of the reference core model
(pretraining/multimae/multimae_crossattn.py:37-545): learned fusion tokens,
modality-typed Zorro-masked self-attention, and per-layer cross-modal fusion
blocks, trained with random modality combinations.

Key structural difference vs the reference (by design, see package README):
the reference gathers visible tokens with data-dependent `nonzero` indexing
(multimae_crossattn.py:402-415) and scatters them back inside every fusion
block with in-place fancy indexing (:454-460). Here the forward uses a fixed
``num_encoded_tokens``-slot packed layout + an inverse-permutation *gather*
(no scatter at all), so any modality-dropout pattern — including fully
missing modalities — runs in one compiled XLA program.

Fusion modes (all reference variants share this one implementation):
  * 'crossattn': per-layer FusionBlock + zorro Block (multimae_crossattn.py)
  * 'zorro':     zorro Blocks only; fusion tokens join via masked self-attn
                 (multimae.py:429-430)
  * 'crossattn_v1': the dated 20231203 dev snapshot — fusion tokens gathered
                 at visible positions, per-layer cross-attention over the
                 mask-embedded modality grids, per-modality pool heads
                 (multimae_crossattn_20231203.py:106-128, 454-471). The
                 published snapshot only executes when every modality's
                 visible count is encoded (e == sum of visible); this
                 static-shape rebuild runs it for any configuration.
  * 'sup':       no fusion-token stream at all (multimae_sup.py)
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import modalities as modreg
from ..ops.attention import (
    multihead_attention,
    packed_token_types,
    packed_valid,
    zorro_mask_from_types,
)
from ..ops.pallas_attn import PAD_TYPE, resolve_attn_mode
from ..ops.masking import MaskInfo
from ..parallel.sp import sp_shard
from ..ops.posemb import build_2d_sincos_posemb
from ..ops.patches import unpatchify
from .adapters import PatchedInputAdapter, SemSegInputAdapter, SpatialOutputAdapter
from .layers import (
    BiaslessLayerNorm,
    EncoderBlock,
    FusionBlock,
    FusionBlockFast,
    Mlp,
    ZorroAttention,
    trunc_normal_init,
)


def _slot_use(slot, e, num_visible):
    """Which full-grid slots hold a real packed token (single canonical
    definition: referenced by both the grid one-hot and the scatter-back)."""
    return (slot < e) & (slot < num_visible[:, None])


class MultiMAE(nn.Module):
    in_domains: Tuple[str, ...] = ("s1", "s2", "dem")
    out_domains: Tuple[str, ...] = ("s1", "s2", "dem")
    image_size: int = 256
    patch_size: int = 16
    dim_tokens: int = 192
    depth: int = 12
    dim_head: int = 64
    heads: int = 3
    ff_mult: int = 4
    num_fusion_tokens: int = 256
    drop_path_rate: float = 0.0
    fusion_mode: str = "crossattn"  # 'crossattn' | 'zorro' | 'sup'
    attn_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    # reconstruction decoder (reference pretrain_mmae.py:202-215 defaults)
    decoder_dim: int = 256
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    # 'simple' = decode the fusion-token grid (output_adapters_simple.py, the
    # path all reference drivers use); 'full' = MAE-style mask-token decoder
    # over the visible tokens (output_adapters.py)
    decoder_style: str = "simple"
    # run the task-generic decoder trunk (proj_context/task_emb/blocks) once
    # for ALL tasks via stacked params + vmap instead of T sequential adapter
    # calls; identical math and checkpoint layout (per-task out_proj applied
    # separately since its width differs per task). Off by default — see
    # DecoderConfig.batch_tasks
    decoder_batch_tasks: bool = False
    # per-layer KV-grid assembly in the fusion blocks: 'gather' = gather-fwd
    # / matmul-bwd custom VJP (ops/assemble.py, kills ~9 GFLOP/layer of
    # forward one-hot matmul); 'onehot' = the round-1 all-matmul path.
    # Bit-identical numerics (tests/test_assemble.py)
    kv_assembly: str = "onehot"

    @property
    def num_patches(self) -> int:
        n = self.image_size // self.patch_size
        return n * n

    @property
    def fusion_type(self) -> int:
        return len(self.in_domains)

    def setup(self):
        specs = {d: modreg.get(d) for d in self.in_domains}
        in_ad = {}
        for d, spec in specs.items():
            if spec.adapter == "semseg":
                in_ad[d] = SemSegInputAdapter(
                    num_classes=spec.num_classes,
                    patch_size=self.patch_size,
                    image_size=self.image_size,
                    stride_level=spec.stride_level,
                    dim_class_emb=spec.dim_class_emb,
                    name=f"input_adapter_{d}",
                )
            else:
                in_ad[d] = PatchedInputAdapter(
                    num_channels=spec.num_channels,
                    patch_size=self.patch_size,
                    image_size=self.image_size,
                    stride_level=spec.stride_level,
                    name=f"input_adapter_{d}",
                )
        self.input_adapters = in_ad
        def out_channels(spec):
            # semseg outputs class logits (dnw: 9, pretrain_mmae_my.py:69-75)
            return spec.num_classes if spec.loss == "cross_entropy" else spec.num_channels

        if self.decoder_style == "full":
            from .adapters import SpatialOutputAdapterFull

            self.output_adapters = {
                d: SpatialOutputAdapterFull(
                    num_channels=out_channels(modreg.get(d)),
                    task=d,
                    context_tasks=tuple(self.in_domains),
                    patch_size=self.patch_size,
                    image_size=self.image_size,
                    stride_level=modreg.get(d).stride_level,
                    dim_tokens=self.decoder_dim,
                    depth=self.decoder_depth,
                    num_heads=self.decoder_num_heads,
                    name=f"output_adapter_{d}",
                )
                for d in self.out_domains
            }
        else:
            self.output_adapters = {
                d: SpatialOutputAdapter(
                    num_channels=out_channels(modreg.get(d)),
                    patch_size=self.patch_size,
                    image_size=self.image_size,
                    stride_level=modreg.get(d).stride_level,
                    dim_tokens=self.decoder_dim,
                    depth=self.decoder_depth,
                    num_heads=self.decoder_num_heads,
                    name=f"output_adapter_{d}",
                )
                for d in self.out_domains
            }

        if self.fusion_mode != "sup":
            # assert matches reference multimae_crossattn.py:87
            assert self.num_fusion_tokens == self.num_patches
            self.fusion_tokens = self.param(
                "fusion_tokens", trunc_normal_init(0.02), (1, self.num_fusion_tokens, self.dim_tokens)
            )
        # return tokens: one per (modality..., fusion) type (multimae_crossattn.py:93-99)
        n_ret = len(self.in_domains) + 1
        self.return_tokens = self.param(
            "return_tokens", trunc_normal_init(0.02), (1, n_ret, self.dim_tokens)
        )
        # per-modality contrastive pool tokens keep the reference's plain
        # randn init (multimae_crossattn.py:105-109 — never trunc_normal'd)
        self.pool_tokens = {
            d: self.param(f"return_token_{d}", nn.initializers.normal(1.0), (1, 1, self.dim_tokens))
            for d in self.in_domains
        }
        self.mask_embedding = self.param(
            "mask_embedding", nn.initializers.zeros, (1, self.num_fusion_tokens, self.dim_tokens)
        )

        self.attn_pool = ZorroAttention(dim_head=self.dim_head, heads=self.heads, name="attn_pool")
        self.mlp = Mlp(hidden_features=int(self.dim_tokens * 4.0), name="mlp")
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        self.blocks = [
            EncoderBlock(
                dim_head=self.dim_head,
                heads=self.heads,
                ff_mult=self.ff_mult,
                drop_path=dpr[i],
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]
        if self.fusion_mode == "crossattn":
            self.fus_blocks = [
                FusionBlockFast(
                    dim_head=self.dim_head, heads=self.heads, ff_mult=self.ff_mult, name=f"fus_block{i}"
                )
                for i in range(self.depth)
            ]
        if self.fusion_mode == "lstm":
            from .layers import AttentionBiLSTM

            self.attn_lstm = AttentionBiLSTM(name="attn_lstm")
        if self.fusion_mode == "crossattn_v1":
            from .layers import SnapshotCrossAttention

            # dated dev snapshot (multimae_crossattn_20231203.py): one shared
            # per-position cross-attention over the mask-embedded modality
            # grids (:106 attn_pool_modalities) + its own MLP (:115), plus
            # SEPARATE per-modality pool attention/MLPs (:107-118)
            self.attn_pool_modalities = SnapshotCrossAttention(
                num_heads=self.heads, name="attn_pool_modalities")
            self.mlp_modalities = Mlp(
                hidden_features=int(self.dim_tokens * 4.0), name="mlp_modalities")
            self.pool_attn = {
                d: ZorroAttention(dim_head=self.dim_head, heads=self.heads,
                                  name=f"attn_{d}")
                for d in self.in_domains
            }
            self.pool_mlp = {
                d: Mlp(hidden_features=int(self.dim_tokens * 4.0),
                       name=f"mlp_{d}")
                for d in self.in_domains
            }
        self.norm = BiaslessLayerNorm(name="norm")

    def _decode_simple(self, grid: jnp.ndarray, use_pallas: bool = False):
        """Per-task reconstruction from the fusion-token grid.

        When ``decoder_batch_tasks`` is on, the task-generic trunk
        (proj_context + task_emb + decoder blocks — identical shapes across
        tasks) runs ONCE for all T tasks: per-task params are stacked on a
        leading axis and the trunk is vmapped, turning T sequential
        dim-256/n-256 attention+MLP chains into one batched chain (T x fewer
        kernel launches; the per-task out_proj, whose width C*p^2 differs by
        task, is applied separately). Identical math and parameter layout —
        checkpoints and the torch weight transplant are unaffected.

        Returns PATCH-layout preds {d: [B, F, p*p*C]}; callers derive pixel
        images via ``_unpatchify_preds`` so the transpose copies dead-code-
        eliminate out of the train step (the patch-space losses never need
        them).
        """
        doms = self.out_domains
        ads = self.output_adapters
        same_trunk = all(
            (ads[d].patch_size, ads[d].image_size, ads[d].stride_level,
             ads[d].dim_tokens, ads[d].depth, ads[d].num_heads, ads[d].qkv_bias)
            == (ads[doms[0]].patch_size, ads[doms[0]].image_size,
                ads[doms[0]].stride_level, ads[doms[0]].dim_tokens,
                ads[doms[0]].depth, ads[doms[0]].num_heads, ads[doms[0]].qkv_bias)
            for d in doms
        )
        if (self.is_initializing() or not self.decoder_batch_tasks
                or len(doms) < 2 or not same_trunk):
            return {d: ads[d](grid, use_pallas=use_pallas, patch_output=True)
                    for d in doms}

        task_params = [ads[d].variables["params"] for d in doms]
        trunk = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[{k: v for k, v in p.items() if k != "out_proj"} for p in task_params],
        )
        tmpl = SpatialOutputAdapter(
            num_channels=1,  # unused on the trunk path
            patch_size=ads[doms[0]].patch_size,
            image_size=ads[doms[0]].image_size,
            stride_level=ads[doms[0]].stride_level,
            dim_tokens=ads[doms[0]].dim_tokens,
            depth=ads[doms[0]].depth,
            num_heads=ads[doms[0]].num_heads,
            qkv_bias=ads[doms[0]].qkv_bias,
            parent=None,
        )
        feats = jax.vmap(
            lambda p, t: tmpl.apply({"params": p}, t, trunk_only=True,
                                    use_pallas=use_pallas),
            in_axes=(0, None),
        )(trunk, grid)  # [T, B, F, dec_dim]

        preds = {}
        for i, d in enumerate(doms):
            w = task_params[i]["out_proj"]["kernel"]
            bias = task_params[i]["out_proj"]["bias"]
            preds[d] = feats[i] @ w + bias
        return preds

    def _unpatchify_preds(self, preds_patch):
        """Patch-layout preds {d: [B, F, p*p*C]} -> pixel images."""
        out = {}
        for d, x in preds_patch.items():
            ad = self.output_adapters[d]
            p = ad.p
            n_h = ad.image_size // (ad.stride_level * p)
            out[d] = unpatchify(x, p, n_h, n_h, ad.num_channels)
        return out

    def _grid_onehot(self, mask_info: MaskInfo, num_encoded_tokens: int, dtype):
        """One-hot scatter matrix [B, T*F, E] mapping packed slots to grid
        positions. Built ONCE per forward; the per-layer grid rebuild then
        becomes a single MXU matmul instead of a TPU-hostile gather (and its
        backward a matmul instead of a scatter)."""
        e = num_encoded_tokens
        slot = mask_info.ids_restore  # [B, T*F]
        use = _slot_use(slot, e, mask_info.num_visible)
        onehot = (slot[..., None] == jnp.arange(e, dtype=slot.dtype)) & use[..., None]
        # Barrier: without it XLA classifies the one-hot build as
        # cheap-to-recompute and duplicates the [B, T*F, E] materialization
        # into every per-layer consumer (round-4 trace: 12 identical
        # 0.088 ms fusions = ~1 ms/step); forcing one materialization makes
        # all layers read the same buffer.
        return jax.lax.optimization_barrier(onehot.astype(dtype)), use

    # ---- shared pieces of the gathered-fusion-stream variants (lstm /
    # crossattn_v1): token-type layout, return-token pooling, grid
    # scatter-back, per-modality pools ----

    def _gathered_layout(self, mask_info: MaskInfo, e: int, b: int):
        """types/valid for the [packed | gathered-fusion] 2E layout."""
        nums = tuple(self.num_patches for _ in self.in_domains)
        mod_types = packed_token_types(mask_info.order, nums, e, 0, self.fusion_type)
        slot_valid = packed_valid(mask_info.num_visible, e, 0)
        fus_types = jnp.full((b, e), self.fusion_type, jnp.int32)
        types = jnp.concatenate([mod_types, fus_types], axis=1)
        valid = jnp.concatenate([slot_valid, slot_valid], axis=1)
        types_padded = jnp.where(valid, types, PAD_TYPE)
        return mod_types, slot_valid, types, valid, types_padded

    def _pool_returns(self, tokens, types, valid, b, dtype):
        """Return-token attention pooling (multimae_crossattn.py:474-497)."""
        ret_types = jnp.arange(len(self.in_domains) + 1, dtype=jnp.int32)
        pool_mask = zorro_mask_from_types(
            jnp.broadcast_to(ret_types[None], (b, ret_types.shape[0])),
            types, self.fusion_type, valid_k=valid,
        )[:, None]
        ret = jnp.broadcast_to(
            self.return_tokens.astype(dtype), (b,) + self.return_tokens.shape[1:]
        )
        # A zero-visible modality's return token has an all-masked row; the
        # reference then uniform-attends over its whole (all-valid) sequence
        # (zorro_utils.py masked_fill(-finfo.max) + softmax). Our packed
        # layout reproduces that by uniform-averaging the valid keys — the
        # exact key set the reference sequence contains. See
        # ops/attention.multihead_attention.
        ret = self.attn_pool(ret, context=tokens, attn_mask=pool_mask,
                             empty_rows_uniform_over=valid[:, None, None, :])
        return ret + self.mlp(self.norm(ret))

    def _scatter_back(self, fusion_part, fusion_full, mask_info: MaskInfo, e: int):
        """Scatter packed fusion tokens back to the full F-grid
        (multimae_lstm.py:484-494): grid position = global index % F; later
        modalities overwrite earlier ones like the reference's sequential
        scatter over cat(s1_idx, s2_idx, dem_idx)."""
        f = self.num_fusion_tokens
        slot = mask_info.ids_restore  # [B, T*F]
        gathered = jnp.take_along_axis(
            fusion_part, jnp.clip(slot, 0, e - 1)[..., None], axis=1)
        use = _slot_use(slot, e, mask_info.num_visible)
        grid_complete = fusion_full
        for m in range(len(self.in_domains)):
            seg_use = use[:, m * f : (m + 1) * f]
            seg_val = gathered[:, m * f : (m + 1) * f]
            grid_complete = jnp.where(seg_use[..., None], seg_val, grid_complete)
        return grid_complete

    def _modality_pools(self, fusion_part, mod_types, slot_valid, b, dtype,
                        attn_for=None, mlp_for=None):
        """Per-modality contrastive pools over the packed fusion stream;
        attn/mlp default to the shared pool modules, crossattn_v1 passes its
        per-modality heads."""
        pooled_mod = {}
        for i, d in enumerate(self.in_domains):
            key_mask = ((mod_types == i) & slot_valid)[:, None, None, :]
            attn = attn_for[d] if attn_for is not None else self.attn_pool
            mlp = mlp_for[d] if mlp_for is not None else self.mlp
            p = jnp.broadcast_to(self.pool_tokens[d].astype(dtype),
                                 (b, 1, self.dim_tokens))
            p = attn(p, context=fusion_part, attn_mask=key_mask)
            p = p + mlp(self.norm(p))
            pooled_mod[d] = p[:, 0, :]
        return pooled_mod


    def __call__(
        self,
        x: Dict[str, jnp.ndarray],
        mask_info: MaskInfo,
        num_encoded_tokens: int,
        deterministic: bool = True,
        trunk_fn=None,
        sp=None,
    ):
        """Forward (reference multimae_crossattn.py:331-545).

        x: {domain: [B, H, W, C]} NHWC (int map [B, H, W] for semseg domains).
        Missing/dropped modalities still require an input array (zeros are
        fine) — their tokens are computed but fully masked out; this is what
        keeps the program shape-static under arbitrary dropout.
        """
        if self.fusion_mode == "sup":
            raise NotImplementedError(
                "fusion_mode='sup' is a downstream backbone variant "
                "(multimae_sup.py has no pretraining driver) — use "
                "ViTBaseline/MaskFormerConfig(fusion_mode='sup') instead"
            )
        e = num_encoded_tokens
        f = self.num_fusion_tokens
        b = x[self.in_domains[0]].shape[0]

        input_task_tokens = {
            d: self.input_adapters[d](x[d], dim_tokens=self.dim_tokens)
            for d in self.in_domains
        }
        dtype = input_task_tokens[self.in_domains[0]].dtype

        # fusion tokens + posemb (FusionInputAdapter, input_adapters.py:185-206)
        hp = self.image_size // self.patch_size
        fus_pos = build_2d_sincos_posemb(hp, hp, self.dim_tokens)
        fusion_tokens = (self.fusion_tokens + fus_pos[None]).astype(dtype)
        fusion_tokens = jnp.broadcast_to(fusion_tokens, (b, f, self.dim_tokens))

        # pack visible tokens (order groups them by modality, ascending index,
        # matching the reference's torch.cat of per-modality visible tokens)
        full = jnp.concatenate([input_task_tokens[d] for d in self.in_domains], axis=1)
        keep = mask_info.order[:, :e]
        onehot = use = None
        if self.fusion_mode == "crossattn" and self.kv_assembly != "gather":
            # The grid one-hot IS the pack permutation's transpose, so the
            # pack runs as one MXU matmul (and its transpose in backward)
            # instead of a gather + grad scatter (round-4 trace: 0.17 +
            # 0.36 ms of gather/scatter fusions). Exact for visible slots
            # (each row sums one 1.0 term); padding slots become zeros
            # instead of clipped-gather duplicates — they are PAD-masked
            # everywhere downstream (types_padded / use / valid).
            onehot, use = self._grid_onehot(mask_info, e, dtype)
            packed = jax.lax.dot_general(
                onehot, full, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        else:
            packed = jnp.take_along_axis(full, keep[..., None], axis=1)  # [B, E, D]

        if self.fusion_mode == "lstm":
            return self._forward_lstm(
                packed, fusion_tokens, mask_info, e, deterministic
            )
        if self.fusion_mode == "crossattn_v1":
            return self._forward_crossattn_v1(
                packed, fusion_tokens, mask_info, e, deterministic
            )

        tokens = jnp.concatenate([packed, fusion_tokens], axis=1)  # [B, E+F, D]

        nums = tuple(self.num_patches for _ in self.in_domains)
        types = packed_token_types(mask_info.order, nums, e, f, self.fusion_type)
        valid = packed_valid(mask_info.num_visible, e, f)
        # PAD-coded types drive both the Pallas kernel (mask recomputed
        # in-VMEM) and the XLA fallback mask
        types_padded = jnp.where(valid, types, PAD_TYPE)
        use_pallas = resolve_attn_mode(self.attn_impl, e + f, self.heads * self.dim_head)

        if self.fusion_mode == "crossattn":
            if self.kv_assembly == "gather":
                slot = mask_info.ids_restore  # [B, T*F]
                use = _slot_use(slot, e, mask_info.num_visible)
                onehot = None  # never materialized; bwd rebuilds per layer
            else:
                slot = None  # onehot/use already built for the pack above
            mask_emb = self.mask_embedding.astype(dtype)
        if trunk_fn is not None and not self.is_initializing():
            # externally supplied trunk (pipeline parallelism,
            # parallel/pp_multimae.py): replaces the per-layer
            # (FusionBlock, EncoderBlock) python loop with a staged,
            # microbatched run over a 'stage' mesh axis. The layer-constant
            # per-example context travels as replicated aux; mask_embedding
            # is broadcast to the batch so its gradient flows through the
            # trunk argument (the broadcast transpose sums it back).
            assert self.fusion_mode == "crossattn", "pp trunk: crossattn only"
            tokens = trunk_fn(tokens, {
                "onehot": onehot,  # None under the gather assembly
                "slot": slot,
                "use": use,
                "types_padded": types_padded,
                "mask_emb": jnp.broadcast_to(
                    mask_emb, (b,) + mask_emb.shape[1:]),
            })
        else:
            for i, blk in enumerate(self.blocks):
                if self.fusion_mode == "crossattn":
                    fusion_new = self.fus_blocks[i](
                        tokens[:, :e, :], tokens[:, e:, :], mask_emb, onehot,
                        use, use_pallas=use_pallas, slot=slot,
                    )
                    tokens = jnp.concatenate(
                        [tokens[:, :e, :], fusion_new], axis=1)
                tokens = blk(
                    tokens,
                    packed_types=types_padded,
                    fusion_type=self.fusion_type,
                    use_pallas=use_pallas,
                    deterministic=deterministic,
                    fusion_tail=0,  # split kernel measured slower (see pallas_attn)
                )
                # sequence parallelism (no-op when sp is None): the residual
                # stream re-shards [B, N/tp, D] between blocks
                tokens = sp_shard(tokens, sp)

        tokens = self.norm(tokens)

        # attention pooling: each return token sees its own modality's packed
        # slots; the fusion return token sees everything valid
        # (multimae_crossattn.py:474-497)
        ret_types = jnp.arange(len(self.in_domains) + 1, dtype=jnp.int32)
        pool_mask = zorro_mask_from_types(
            ret_types[None].repeat(b, 0), types, self.fusion_type, valid_k=valid
        )[:, None]
        ret = jnp.broadcast_to(
            self.return_tokens.astype(dtype), (b,) + self.return_tokens.shape[1:]
        )
        # zero-visible modality => all-masked row => reference uniform-attends
        # over the whole sequence (see _pool_returns / ops/attention.py)
        ret = self.attn_pool(ret, context=tokens, attn_mask=pool_mask,
                             empty_rows_uniform_over=valid[:, None, None, :])
        ret = ret + self.mlp(self.norm(ret))

        encoder_fusion_tokens = tokens[:, e:, :]
        if self.decoder_style == "full":
            preds_patch = {
                d: self.output_adapters[d](tokens[:, :e, :], mask_info, e,
                                           patch_output=True)
                for d in self.out_domains
            }
        else:
            preds_patch = self._decode_simple(encoder_fusion_tokens,
                                              use_pallas=use_pallas)

        # contrastive pools over fusion tokens at each modality's visible
        # positions (multimae_crossattn.py:529-543)
        pooled_mod = {}
        for d in self.in_domains:
            key_mask = (mask_info.task_masks[d] == 0)[:, None, None, :]  # [B,1,1,F]
            p = jnp.broadcast_to(self.pool_tokens[d].astype(dtype), (b, 1, self.dim_tokens))
            p = self.attn_pool(p, context=encoder_fusion_tokens, attn_mask=key_mask)
            p = p + self.mlp(self.norm(p))
            pooled_mod[d] = p[:, 0, :]

        return {
            "preds": self._unpatchify_preds(preds_patch),
            "preds_patch": preds_patch,  # [B, F, p*p*C] per task
            "task_masks": mask_info.task_masks,
            "pooled": ret,  # [B, T+1, D]: per-modality + fusion pools
            "ori_tokens": tokens[:, :e, :],
            "fusion_tokens": encoder_fusion_tokens,
            "pooled_mod": pooled_mod,  # {domain: [B, D]} fusion-stream pools
        }


def _multimae_forward_lstm(self, packed, fusion_full, mask_info, e, deterministic):
    """fusion_mode='lstm' (reference multimae_lstm.py / multimae_lstm_s2dsm.py):
    the fusion stream is gathered at the packed visible positions (:394 —
    fusion token per slot = grid entry at the modality-LOCAL index, i.e.
    complete_fusion_tokens[:, cat(s1_idx, s2_idx, dem_idx)]);
    one AttentionBiLSTM fuses the [token, fusion] pair per position before
    the block loop (:437-442); after encoding, fusion tokens are scattered
    back to the full grid for the output adapters (:484-494)."""
    b = packed.shape[0]
    f = self.num_fusion_tokens
    dtype = packed.dtype
    keep = mask_info.order[:, :e] % f
    fusion_stream = jnp.take_along_axis(fusion_full, keep[..., None], axis=1)  # [B,E,D]

    # single BiLSTM fusion of the (modality token, fusion token) pair
    stack = jnp.stack([packed, fusion_stream], axis=2)  # [B, E, 2, D]
    fused = self.attn_lstm(stack.reshape(b * e, 2, -1)).reshape(b, e, -1)
    tokens = jnp.concatenate([packed, fused], axis=1)  # [B, 2E, D]

    mod_types, slot_valid, types, valid, types_padded = self._gathered_layout(
        mask_info, e, b)
    use_pallas = resolve_attn_mode(self.attn_impl, 2 * e, self.heads * self.dim_head)

    for blk in self.blocks:
        tokens = blk(tokens, packed_types=types_padded, fusion_type=self.fusion_type,
                     use_pallas=use_pallas, deterministic=deterministic,
                     fusion_tail=0)
    tokens = self.norm(tokens)

    ret = self._pool_returns(tokens, types, valid, b, dtype)
    fusion_part = tokens[:, e:, :]  # aligned with packed slots
    grid_complete = self._scatter_back(fusion_part, fusion_full, mask_info, e)
    preds_patch = self._decode_simple(grid_complete)
    pooled_mod = self._modality_pools(fusion_part, mod_types, slot_valid, b, dtype)

    return {
        "preds": self._unpatchify_preds(preds_patch),
        "preds_patch": preds_patch,
        "task_masks": mask_info.task_masks,
        "pooled": ret,
        "ori_tokens": tokens[:, :e, :],
        "fusion_tokens": grid_complete,
        "pooled_mod": pooled_mod,
    }


def _multimae_forward_crossattn_v1(self, packed, fusion_full, mask_info,
                                   e, deterministic):
    """fusion_mode='crossattn_v1' (multimae_crossattn_20231203.py): the
    dated dev snapshot. Fusion tokens are gathered at the packed visible
    positions (:407-408, like the LSTM variant); every layer scatters the
    current visible tokens into per-modality mask-embedding grids and each
    fusion token cross-attends over its own position's modality stack
    (:458-475 — the scatter/stack here is the one-hot MXU assembly), then
    fus += mlp_modalities(norm(.)) (:476) before the zorro block; after
    encoding, fusion tokens scatter back to the full grid for the output
    adapters (:509-512) and per-modality pools use their OWN attention/MLPs
    (:540-...; the flagship shares one attn_pool)."""
    b = packed.shape[0]
    f = self.num_fusion_tokens
    t_mod = len(self.in_domains)
    dtype = packed.dtype
    keep = mask_info.order[:, :e] % f
    fusion_stream = jnp.take_along_axis(fusion_full, keep[..., None], axis=1)

    mod_types, slot_valid, types, valid, types_padded = self._gathered_layout(
        mask_info, e, b)
    use_pallas = resolve_attn_mode(self.attn_impl, 2 * e, self.heads * self.dim_head)

    onehot, use = self._grid_onehot(mask_info, e, dtype)  # [B, T*F, E]
    sel = jax.nn.one_hot(keep, f, dtype=dtype)  # [B, E, F] per-slot grid pick
    mask_emb = self.mask_embedding.astype(dtype)

    tokens = jnp.concatenate([packed, fusion_stream], axis=1)
    for blk in self.blocks:
        cur = tokens[:, :e, :]
        fus = tokens[:, e:, :]
        grid = jnp.einsum(
            "bge,bed->bgd", onehot, cur, preferred_element_type=jnp.float32
        ).astype(dtype)
        grid = grid + jnp.where(use[..., None], 0, jnp.tile(mask_emb, (1, t_mod, 1)))
        grid = grid.reshape(b, t_mod, f, self.dim_tokens)
        ctx = jnp.einsum("bef,btfd->betd", sel, grid)  # [B, E, T, D]
        crossed = self.attn_pool_modalities(fus, ctx)
        fus = fus + self.mlp_modalities(self.norm(crossed))
        tokens = jnp.concatenate([cur, fus], axis=1)
        tokens = blk(tokens, packed_types=types_padded,
                     fusion_type=self.fusion_type, use_pallas=use_pallas,
                     deterministic=deterministic, fusion_tail=0)
    tokens = self.norm(tokens)

    ret = self._pool_returns(tokens, types, valid, b, dtype)
    fusion_part = tokens[:, e:, :]
    grid_complete = self._scatter_back(fusion_part, fusion_full, mask_info, e)

    # the snapshot feeds its output adapters the completed fusion grid with
    # full-MAE-style kwargs (:509-524); both decoder styles supported here
    if self.decoder_style == "full":
        preds_patch = {
            d: self.output_adapters[d](tokens[:, :e, :], mask_info, e,
                                       patch_output=True)
            for d in self.out_domains
        }
    else:
        preds_patch = self._decode_simple(grid_complete)

    pooled_mod = self._modality_pools(
        fusion_part, mod_types, slot_valid, b, dtype,
        attn_for=self.pool_attn, mlp_for=self.pool_mlp)

    return {
        "preds": self._unpatchify_preds(preds_patch),
        "preds_patch": preds_patch,
        "task_masks": mask_info.task_masks,
        "pooled": ret,
        "ori_tokens": tokens[:, :e, :],
        "fusion_tokens": grid_complete,
        "pooled_mod": pooled_mod,
    }


MultiMAE._forward_lstm = _multimae_forward_lstm
MultiMAE._forward_crossattn_v1 = _multimae_forward_crossattn_v1


def build_multimae(cfg) -> MultiMAE:
    """Build from a PretrainConfig (factories multimae_crossattn.py:548-599)."""
    return MultiMAE(
        in_domains=tuple(cfg.data.in_domains),
        out_domains=tuple(cfg.data.out_domains),
        image_size=cfg.data.input_size,
        patch_size=cfg.data.patch_size,
        dim_tokens=cfg.model.dim_tokens,
        depth=cfg.model.depth,
        dim_head=cfg.model.dim_head,
        heads=cfg.model.heads,
        ff_mult=cfg.model.ff_mult,
        num_fusion_tokens=cfg.model.num_fusion_tokens,
        drop_path_rate=cfg.model.drop_path_rate,
        fusion_mode=cfg.model.fusion_mode,
        attn_impl=cfg.model.attn_impl,
        kv_assembly=getattr(cfg.model, "kv_assembly", "onehot"),
        decoder_dim=cfg.decoder.dim,
        decoder_depth=cfg.decoder.depth,
        decoder_num_heads=cfg.decoder.num_heads,
        decoder_style=cfg.decoder.style,
        decoder_batch_tasks=cfg.decoder.batch_tasks,
    )
