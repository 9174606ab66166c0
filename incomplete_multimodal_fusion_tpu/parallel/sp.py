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

The mesh/axis pair rides a contextvar set by the train-step wrapper
(`train/pretrain.make_sp_step` / `dryrun_multichip`) because constraints
must be visible at trace time inside model code without threading a mesh
through every flax module.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_SP_CTX: contextvars.ContextVar[Optional[Tuple[Mesh, str, str]]] = \
    contextvars.ContextVar("imf_sp_ctx", default=None)


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, model_axis: str = "model",
                      data_axis: str = "data"):
    """Enable SP constraints for model code traced inside this context."""
    tok = _SP_CTX.set((mesh, model_axis, data_axis))
    try:
        yield
    finally:
        _SP_CTX.reset(tok)


def sp_enabled() -> bool:
    return _SP_CTX.get() is not None


def wrap_step(step_fn, mesh: Mesh, model_axis: str = "model",
              data_axis: str = "data"):
    """Wrap a train/eval step so the sequence_parallel context is active at
    trace time (jit traces inside the first call)."""
    def wrapped(*args, **kwargs):
        with sequence_parallel(mesh, model_axis, data_axis):
            return step_fn(*args, **kwargs)
    return wrapped


def sp_shard(x: jax.Array) -> jax.Array:
    """Constrain a [B, N, ...] activation to be sequence-sharded over the
    model axis (and batch-sharded over the data axis). Identity when no
    sequence_parallel context is active or the token axis does not divide
    the axis size (GSPMD would silently pad; an uneven shard is never
    worth the constraint)."""
    ctx = _SP_CTX.get()
    if ctx is None or x.ndim < 2:
        return x
    mesh, model_axis, data_axis = ctx
    tp = mesh.shape.get(model_axis, 1)
    if tp == 1 or x.shape[1] % tp != 0:
        return x
    spec = P(data_axis, model_axis, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
