"""Pipeline parallelism: GPipe-style microbatch pipelining of a homogeneous
block stack over a ``stage`` mesh axis.

TPU-native formulation (scaling-book pipelining recipe): the L blocks'
parameters are stacked on a leading stage dimension and sharded
``P('stage')``, so each device materializes only its own stage's weights;
activations flow stage-to-stage with ``lax.ppermute`` over ICI inside a
``shard_map``, and a ``lax.scan`` over M + S - 1 ticks keeps every device
busy once the pipeline fills. Differentiable end-to-end (scan + ppermute
have transposes), so the same function serves training.

No reference counterpart — the reference is single-process DDP
(pretraining/utils/dist.py); this completes the beyond-reference
parallelism stack (DP / TP / ZeRO-3 FSDP / SP / PP).

Numerics are bit-identical to the sequential block loop
(tests/test_pipeline.py, forward AND gradients).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(per_block_params, n_stages: int):
    """[params_block_0 .. params_block_{L-1}] -> pytree with leading dims
    [S, L/S, ...]: stage-major stacking so stage s owns blocks
    s*L/S .. (s+1)*L/S - 1 (contiguous groups, GPipe layout)."""
    n_blocks = len(per_block_params)
    if n_blocks % n_stages:
        raise ValueError(f"{n_blocks} blocks do not divide {n_stages} stages")
    per_stage = n_blocks // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_block_params)
    return jax.tree.map(
        lambda x: x.reshape((n_stages, per_stage) + x.shape[1:]), stacked
    )


def pipeline_apply(
    block_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    stage_axis: str = "stage",
    microbatches: int = 0,
    aux=None,
    batch_axis=None,
):
    """Run ``x`` through S stages of ``per_stage`` blocks each, pipelined.

    block_fn(params_one_block, x[, aux]) -> x   (shape-preserving)
    stage_params: pytree, leading dims [S, per_stage, ...]
    x: [B, ...] global batch, B divisible by ``microbatches`` (default S)
    aux: optional pytree of [B, ...] arrays of layer-constant per-example
        context (e.g. attention masks / one-hot scatter grids). Replicated
        to every stage — NOT shipped over ICI with the activations — and
        indexed per tick so stage s sees the aux rows of the microbatch it
        is currently processing (microbatch t - s at tick t).
    batch_axis: optional second mesh axis name (e.g. 'data') to shard each
        microbatch's rows over — DP x PP composition: params replicated
        over it, activations/aux split, so every (data, stage) device
        computes its own batch slice of its own stage.
    Returns [B, ...], bit-identical to applying all S*per_stage blocks
    sequentially.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    s = mesh.shape[stage_axis]
    m = microbatches or s
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} does not divide {m} microbatches")
    mb = b // m
    x_mb = x.reshape((m, mb) + x.shape[1:])
    aux_mb = jax.tree.map(lambda a: a.reshape((m, mb) + a.shape[1:]), aux)
    perm = [(i, (i + 1) % s) for i in range(s)]

    def stage_fn(params, y, aux_t):
        # params: [per_stage, ...] for THIS stage only (shard_map slice)
        def body(carry, block_params):
            out = (block_fn(block_params, carry) if aux is None
                   else block_fn(block_params, carry, aux_t))
            return out, None

        out, _ = jax.lax.scan(body, y, params)
        return out

    # vma (varying-mesh-axes) checking is off: the stage body may lower
    # Pallas kernels (whose out_shapes carry no vma annotation), and the
    # tick recurrence makes everything stage-varying anyway
    import inspect

    flag = ("check_vma" if "check_vma" in inspect.signature(shard_map).parameters
            else "check_rep")  # older jax spelling
    # activations/aux: [m, mb, ...] — microbatch dim replicated over stages,
    # rows optionally split over the batch axis (DP x PP)
    xspec = P(None, batch_axis) if batch_axis else P()
    smap = partial(shard_map, mesh=mesh, in_specs=(P(stage_axis), xspec, xspec),
                   out_specs=xspec, **{flag: False})

    @smap
    def run(params, x_all, aux_all):
        params = jax.tree.map(lambda p: p[0], params)  # drop sharded dim 1
        stage = jax.lax.axis_index(stage_axis)

        def _varying(v):
            # the scan carry becomes stage-varying after the first tick;
            # mark the zero-init the same way so carry types match
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(v, (stage_axis,), to="varying")
            if hasattr(jax.lax, "pvary"):
                return jax.lax.pvary(v, (stage_axis,))
            return v

        state = _varying(jnp.zeros_like(x_all[0]))
        ys = _varying(jnp.zeros_like(x_all))

        def tick(carry, t):
            state, ys = carry
            # stage 0 injects microbatch t while t < m; later ticks recirculate
            feed = x_all[jnp.minimum(t, m - 1)]
            inp = jnp.where((stage == 0) & (t < m), feed, state)
            # stage s processes microbatch t - s at tick t (clipped rows are
            # pipeline-bubble garbage whose outputs are never stored)
            aux_t = jax.tree.map(
                lambda a: a[jnp.clip(t - stage, 0, m - 1)], aux_all
            )
            out = stage_fn(params, inp, aux_t)
            # the last stage owns microbatch t-(s-1) at tick t
            done = t - (s - 1)
            ys = jnp.where(
                (stage == s - 1) & (done >= 0),
                jax.lax.dynamic_update_index_in_dim(
                    ys, out, jnp.maximum(done, 0), 0
                ),
                ys,
            )
            state = jax.lax.ppermute(out, stage_axis, perm)
            return (state, ys), None

        (_, ys), _ = jax.lax.scan(
            tick, (state, ys), jnp.arange(m + s - 1)
        )
        # only the last stage holds real outputs; replicate them
        ys = jax.lax.psum(
            jnp.where(stage == s - 1, ys, jnp.zeros_like(ys)), stage_axis
        )
        return ys

    ys = run(stage_params, x_mb, aux_mb)
    return ys.reshape((b,) + x.shape[1:])
