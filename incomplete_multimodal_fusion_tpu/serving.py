"""Serving export: package the flagship inference forward as a serialized,
versioned StableHLO artifact (``jax.export``) that reloads and runs WITHOUT
the model code or flax — just jax and the weights baked into the artifact.

The reference has no serving story (its inference surface is the
``infer_mmae.py`` script, which rebuilds the torch model from source and
loads a .pth each run). TPU-native deployment wants an ahead-of-time
artifact: one trace, one compile, stable custom-call ABI, no Python model
tree on the serving host. The exported function takes the raw modality
rasters plus per-modality patch masks (1 = dropped), i.e. the
incomplete-multimodal contract (multimae_crossattn.py:395-399's
user-supplied mask branch), and returns the reconstruction dict.

Usage:
    blob = export_infer(model, params, image_size=256)   # bytes
    serve = load_exported(blob)
    preds = serve(x_dict_values..., mask_values...)      # flat args

CLI: ``python scripts/export_serving.py ckpt_dir out.stablehlo``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .ops import masking


def _infer_closure(model, params, domains: Tuple[str, ...]):
    """Flat-signature forward (export wants positional array args):
    (x_d0..x_dk, mask_d0..mask_dk) -> dict of reconstructions."""
    n_dom = len(domains)

    def fn(*args):
        x = dict(zip(domains, args[:n_dom]))
        task_masks = dict(zip(domains, args[n_dom:]))
        n = model.num_patches
        # full capacity: any visible subset packs without recompiling
        e = n * n_dom
        mi = masking.mask_info_from_task_masks(task_masks, domains, e)
        out = model.apply({"params": params}, x, mi, e)
        return {"preds": out["preds"], "pooled": out["pooled"]}

    return fn


def export_infer(model, params, batch: int = 1,
                 image_size: int = 256) -> bytes:
    """Serialize the jitted full-visibility/ablation forward for the given
    static batch and image size. Weights are closed over (baked into the
    artifact as constants) so the serving host needs no checkpoint."""
    from jax import export as jexport

    domains = tuple(model.in_domains)
    n = model.num_patches
    args = []
    for d in domains:
        ch = _num_channels(d)
        args.append(jax.ShapeDtypeStruct((batch, image_size, image_size, ch),
                                         jnp.float32))
    for _ in domains:
        args.append(jax.ShapeDtypeStruct((batch, n), jnp.int32))
    fn = jax.jit(_infer_closure(model, params, domains))
    return bytes(jexport.export(fn)(*args).serialize())


def _num_channels(domain: str) -> int:
    from . import modalities as modreg

    return modreg.get(domain).num_channels


def load_exported(blob: bytes):
    """Deserialize an export_infer artifact into a callable taking the same
    flat (x_d0..x_dk, mask_d0..mask_dk) arguments."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)

    def serve(*args):
        return exp.call(*args)

    return serve
