"""Sequence parallelism: shard the packed-token axis of the residual stream
over the tensor-parallel (`model`) mesh axis between encoder blocks.

Megatron-SP recipe, expressed the GSPMD way (scaling-book: annotate, let XLA
place collectives): the residual stream [B, N, D] carries a
``with_sharding_constraint`` of ``P(data, model, None)`` at block
boundaries, so LayerNorms / residual adds / elementwise chains run
sequence-sharded (1/tp of the activation bytes per device) while the
TP-sharded attention and MLP matmuls gather exactly the tokens they need —
XLA inserts the all-gather / reduce-scatter pairs on ICI. No reference
counterpart (the reference is DDP-only, pretraining/utils/dist.py); this is
part of the beyond-reference parallelism stack (TP + ZeRO-3 FSDP + SP).

The spec is threaded EXPLICITLY: callers build an :class:`SPSpec` and pass
it through ``make_train_step(..., sp=spec)`` → ``model.apply(..., sp=spec)``
→ ``sp_shard(tokens, spec)``. No contextvars, no module globals — the
model's forward signature shows exactly what couples it to the mesh.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SPSpec(NamedTuple):
    """Everything sp_shard needs: the mesh and the two axis names."""
    mesh: Mesh
    model_axis: str = "model"
    data_axis: str = "data"


def sp_shard(x: jax.Array, sp: Optional[SPSpec]) -> jax.Array:
    """Constrain a [B, N, ...] activation to be sequence-sharded over the
    model axis (and batch-sharded over the data axis). Identity when ``sp``
    is None or the token axis does not divide the axis size (GSPMD would
    silently pad; an uneven shard is never worth the constraint)."""
    if sp is None or x.ndim < 2:
        return x
    mesh, model_axis, data_axis = sp
    tp = mesh.shape.get(model_axis, 1)
    if tp == 1 or x.shape[1] % tp != 0:
        return x
    spec = P(data_axis, model_axis, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
