"""Sharding rules: how params / batches / states map onto the mesh.

The reference's only parallelism is data parallel (SURVEY §2.4). Here we
support DP over a ``data`` axis plus optional Megatron-style tensor
parallelism over a ``model`` axis: attention/MLP projection kernels are
sharded on their hidden dimension and XLA inserts the all-reduces
(scaling-book recipe: annotate shardings, let GSPMD place collectives on
ICI). ``fsdp_shardings`` additionally shards parameters (and, through the
same tree, AdamW moments) along the data axis ZeRO-3-style — GSPMD
all-gathers weights per layer and reduce-scatters their grads, cutting
per-device param+optimizer memory by ~1/dp for models that outgrow a chip.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernels whose OUTPUT dim is the sharded hidden dim (column parallel)
_COL_PARALLEL = ("to_q/kernel", "to_kv/kernel", "qkv/kernel", "kv/kernel",
                 "fc1/kernel", "proj_in/kernel", "q/kernel")
# kernels whose INPUT dim is the sharded hidden dim (row parallel)
_ROW_PARALLEL = ("to_out/kernel", "proj/kernel", "fc2/kernel", "proj_out/kernel")


def param_spec(path: str, shape, model_axis: Optional[str], axis_size: int = 1) -> P:
    ndim = len(shape)
    if model_axis is None or ndim < 2:
        return P()
    if any(path.endswith(s) for s in _COL_PARALLEL) and shape[-1] % axis_size == 0:
        return P(*([None] * (ndim - 1) + [model_axis]))
    if any(path.endswith(s) for s in _ROW_PARALLEL) and shape[-2] % axis_size == 0:
        return P(*([None] * (ndim - 2) + [model_axis, None]))
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def params_shardings(params, mesh: Mesh, model_axis: Optional[str] = None):
    """NamedSharding tree for params: replicated, or TP-sharded kernels when a
    `model` mesh axis is given."""

    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(model_axis, 1)

    def f(path, leaf):
        return NamedSharding(
            mesh, param_spec(_path_str(path), leaf.shape, model_axis, axis_size)
        )

    return jax.tree_util.tree_map_with_path(f, params)


def fsdp_shardings(params, mesh: Mesh, data_axis: str = "data",
                   min_size: int = 2 ** 12,
                   model_axis: Optional[str] = None):
    """ZeRO-3-style parameter sharding: every large-enough param is split on
    its largest axis-size-divisible dimension across the data axis; small
    params stay replicated (sharding overhead beats the memory win).

    With ``model_axis`` the tensor-parallel kernel specs (param_spec) are
    computed first and FSDP takes a *different* dimension, so TP + FSDP
    compose instead of FSDP silently replicating the TP shards.

    Apply the same tree to the optimizer state (optax moments mirror the
    param tree), and GSPMD inserts per-layer all-gathers in the forward and
    reduce-scatters in the backward."""
    axis_size = mesh.shape[data_axis]
    tp_size = mesh.shape.get(model_axis, 1) if model_axis else 1

    def spec(path: str, shape) -> P:
        tp = param_spec(path, shape, model_axis, tp_size)
        size = 1
        for s in shape:
            size *= s
        if size < min_size or axis_size == 1:
            return tp
        taken = {i for i, ax in enumerate(tp) if ax is not None}
        best, best_dim = 0, -1
        for i, s in enumerate(shape):
            if i not in taken and s % axis_size == 0 and s > best:
                best, best_dim = s, i
        if best_dim < 0:
            return tp
        axes = list(tp) + [None] * (len(shape) - len(tp))
        axes[best_dim] = data_axis
        return P(*axes)

    def f(path, leaf):
        return NamedSharding(mesh, spec(_path_str(path), leaf.shape))

    return jax.tree_util.tree_map_with_path(f, params)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data",
                batch_axis: int = 0):
    """Put a host batch on the mesh, sharded over ``data_axis`` at array
    dim ``batch_axis`` (0 for [B, ...]; 1 for K-stacked [K, B, ...]
    multi-step batches — the scan axis stays replicated)."""
    spec = P(*([None] * batch_axis + [data_axis]))
    s = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
