"""Pipeline parallelism over the REAL flagship MultiMAE trunk.

The flagship's per-layer structure is a (FusionBlockFast, EncoderBlock)
pair applied to the packed [B, E+F, D] token stream
(models/multimae.py `__call__`, reference multimae_crossattn.py:450-470).
Both halves are shape-preserving on the stream, and the per-example
context they need (the one-hot scatter grid, slot-use mask, padded token
types, mask embedding) is layer-constant — exactly the contract
``parallel.pipeline.pipeline_apply`` pipelines: stage-stacked layer
params sharded ``P('stage')``, activations flowing stage-to-stage over
ICI via ``ppermute``, context replicated per stage (never shipped).

``make_pp_trunk`` builds a ``trunk_fn`` that MultiMAE.__call__ accepts in
place of its python layer loop; ``train.pretrain.make_train_step(...,
pp_mesh=...)`` threads it through the loss so the FULL training step
(masking, adapters, pipelined trunk, decoders, losses, AdamW) runs
pipelined. Numerics equal the sequential loop — forward, loss and
gradients (tests/test_pipeline_multimae.py).

No reference counterpart: the reference is single-process DDP
(pretraining/utils/dist.py); this completes PP integration on the real
model rather than a toy block stack.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.layers import EncoderBlock, FusionBlockFast
from ..ops.pallas_attn import resolve_attn_mode
from .pipeline import pipeline_apply, stack_stage_params


def multimae_layer_params(params, depth: int):
    """Per-layer (fusion, encoder) param pairs from a MultiMAE param tree."""
    return [
        {"fus": params[f"fus_block{i}"], "blk": params[f"block{i}"]}
        for i in range(depth)
    ]


def make_pp_trunk(
    model,
    params,
    mesh: Mesh,
    stage_axis: str = "stage",
    microbatches: int = 0,
):
    """trunk_fn(tokens, aux) running ``model``'s crossattn layer pairs
    GPipe-pipelined over ``mesh[stage_axis]``.

    ``params`` is the (compute-dtype cast) MultiMAE param tree the step is
    differentiating — the stage stacking is a jnp.stack of those leaves, so
    gradients flow back to the original per-layer params through it.

    Constraints (asserted): fusion_mode='crossattn', depth divisible by the
    stage count, drop_path_rate == 0 (stochastic depth would need per-layer
    rngs inside the stage scan; the flagship config has 0).
    """
    if model.fusion_mode != "crossattn":
        raise ValueError("pp trunk supports fusion_mode='crossattn' only")
    if model.drop_path_rate != 0.0:
        raise ValueError("pp trunk requires drop_path_rate == 0")
    n_stages = mesh.shape[stage_axis]
    stage_params = stack_stage_params(
        multimae_layer_params(params, model.depth), n_stages
    )
    fus_tmpl = FusionBlockFast(
        dim_head=model.dim_head, heads=model.heads, ff_mult=model.ff_mult
    )
    blk_tmpl = EncoderBlock(
        dim_head=model.dim_head, heads=model.heads, ff_mult=model.ff_mult
    )
    f = model.num_fusion_tokens
    fusion_type = model.fusion_type

    def trunk_fn(tokens, aux):
        e = tokens.shape[1] - f
        use_pallas = resolve_attn_mode(model.attn_impl, e + f, model.heads * model.dim_head)

        def block_fn(pair, toks, a):
            fusion_new = fus_tmpl.apply(
                {"params": pair["fus"]},
                toks[:, :e, :], toks[:, e:, :],
                a["mask_emb"], a["onehot"], a["use"],
                use_pallas=use_pallas, slot=a.get("slot"),
            )
            toks = jnp.concatenate([toks[:, :e, :], fusion_new], axis=1)
            return blk_tmpl.apply(
                {"params": pair["blk"]},
                toks,
                packed_types=a["types_padded"],
                fusion_type=fusion_type,
                use_pallas=use_pallas,
                deterministic=True,
            )

        return pipeline_apply(
            block_fn, stage_params, tokens, mesh,
            stage_axis=stage_axis, microbatches=microbatches, aux=aux,
            batch_axis="data" if "data" in mesh.axis_names else None,
        )

    return trunk_fn
