"""Pallas TPU kernel: fusion-row attention over the tiny modality axis.

``models.layers.FusionBlockFast`` attends each fusion token to its T
modality-grid slots + itself (reference zorro_utils.py:243-258 computes the
full [B, N, M, M] attention and keeps the fusion row; the Fast variant
already reduces that to fusion-row queries). The XLA lowering of the
remaining chain is the round-3 profile's biggest non-kernel cost: the
[B, T, F, h, dh] -> [B, F, T, h, dh] KV transposes materialize ~0.9 ms/step
of copies, and the broadcast multiply-reduce sim/softmax/weighted-sum runs
as ~30 small VPU fusions with f32 round-trips.

This kernel takes the UNtransposed operands exactly as produced upstream —
q [B, F, I], kv_grid [B, T*F, 2I] (t-major), kv_f [B, F, 2I] — and runs the
whole sim/softmax/mix per batch row in VMEM. The modality axis (T+1, =3 at
the flagship) is unrolled: per (head, t) the similarity is a lane-reduction
of q_h * k_th, softmax over t is elementwise max/exp/sum across the
unrolled slots, so no [.., 1]-trailing HBM operands and no transposes
anywhere. All grads (dq, dkv_grid, dkv_f) come from one backward kernel
with the same recompute structure.

Numerics mirror FusionBlockFast's XLA path exactly: sim accumulated in f32
((q*scale)_f32 * k_f32 summed over dh), f32 softmax, weighted sum of v in
f32, output cast back to the activation dtype.

Only the plane_valid=None path (the pretraining drivers) routes here; the
downstream backbone's traced-present-subset masking stays on XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import interpret_mode


def _par(ndims: int):
    """'parallel' grid semantics: every program writes disjoint output
    blocks and no scratch is shared, so Mosaic may reorder/double-buffer
    freely (16% on the GEGLU fwd, round 5)."""
    return pltpu.CompilerParams(dimension_semantics=("parallel",) * ndims)


def _head_slots(q_ref, kvg_ref, kvf_ref, j, hh, t_mod, f, inner, dh, scale):
    """Per-head views: scaled f32 query, f32 keys, activation-dtype values
    (FusionBlockFast numerics: q*scale in the activation dtype then cast
    f32, keys cast f32 for the sim, values stay bf16 for the mix)."""
    sl = slice(hh * dh, (hh + 1) * dh)
    vsl = slice(inner + hh * dh, inner + (hh + 1) * dh)
    q = q_ref[j, :, sl]
    qh = (q * jnp.asarray(scale, q.dtype)).astype(jnp.float32)  # [F, dh]
    ks, vs = [], []
    for t in range(t_mod):
        rows = slice(t * f, (t + 1) * f)
        ks.append(kvg_ref[j, rows, sl].astype(jnp.float32))
        vs.append(kvg_ref[j, rows, vsl])
    ks.append(kvf_ref[j, :, sl].astype(jnp.float32))
    vs.append(kvf_ref[j, :, vsl])
    return qh, ks, vs


def _softmax_slots(sims):
    """Elementwise softmax across the unrolled slot list ([F, 1] each)."""
    m = sims[0]
    for s in sims[1:]:
        m = jnp.maximum(m, s)
    es = [jnp.exp(s - m) for s in sims]
    denom = es[0]
    for e in es[1:]:
        denom = denom + e
    return [e / denom for e in es]


def _fwd_kernel(q_ref, kvg_ref, kvf_ref, o_ref, *, t_mod, heads, dh, scale,
                nb=1):
    f = q_ref.shape[1]
    inner = heads * dh
    for j in range(nb):
        for hh in range(heads):
            qh, ks, vs = _head_slots(q_ref, kvg_ref, kvf_ref, j, hh, t_mod, f,
                                     inner, dh, scale)
            sims = [jnp.sum(qh * k, axis=-1, keepdims=True) for k in ks]
            attn = _softmax_slots(sims)
            # the mix runs in the activation dtype, matching the module's
            # attn.astype(v.dtype) * v summed over slots
            out = attn[0].astype(o_ref.dtype) * vs[0]
            for a, v in zip(attn[1:], vs[1:]):
                out = out + a.astype(o_ref.dtype) * v
            o_ref[j, :, hh * dh:(hh + 1) * dh] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, kvg_ref, kvf_ref, do_ref,
                dq_ref, dkvg_ref, dkvf_ref, *, t_mod, heads, dh,
                scale, nb=1):
    f = q_ref.shape[1]
    inner = heads * dh
    for j in range(nb):
        for hh in range(heads):
            sl = slice(hh * dh, (hh + 1) * dh)
            vsl = slice(inner + hh * dh, inner + (hh + 1) * dh)
            qh, ks, vs = _head_slots(q_ref, kvg_ref, kvf_ref, j, hh, t_mod, f,
                                     inner, dh, scale)
            sims = [jnp.sum(qh * k, axis=-1, keepdims=True) for k in ks]
            attn = _softmax_slots(sims)
            do_bf = do_ref[j, :, sl]  # [F, dh] activation dtype
            do = do_bf.astype(jnp.float32)
            dattn = [jnp.sum(do * v.astype(jnp.float32), axis=-1, keepdims=True)
                     for v in vs]
            inner_sum = attn[0] * dattn[0]
            for a, da in zip(attn[1:], dattn[1:]):
                inner_sum = inner_sum + a * da
            dsims = [a * (da - inner_sum) for a, da in zip(attn, dattn)]
            # dq accumulates over slots; qh carried the scale, so dq does too
            dq = dsims[0] * ks[0]
            for ds, k in zip(dsims[1:], ks[1:]):
                dq = dq + ds * k
            dq_ref[j, :, sl] = (dq * scale).astype(dq_ref.dtype)
            for t in range(t_mod):
                rows = slice(t * f, (t + 1) * f)
                dkvg_ref[j, rows, sl] = (dsims[t] * qh).astype(dkvg_ref.dtype)
                dkvg_ref[j, rows, vsl] = (attn[t].astype(do_bf.dtype) * do_bf)
            dkvf_ref[j, :, sl] = (dsims[t_mod] * qh).astype(dkvf_ref.dtype)
            dkvf_ref[j, :, vsl] = attn[t_mod].astype(do_bf.dtype) * do_bf


def _batch_block(b: int, bytes_per_row: float, budget: float = 8e6) -> int:
    """Largest divisor of b whose double-buffered blocked slabs fit VMEM —
    batching rows per program amortizes per-program overhead (round-5
    roofline: fwd+bwd at ~54% of their memory bounds with one-row
    programs)."""
    for nb in (6, 5, 4, 3, 2):
        if b % nb == 0 and nb * bytes_per_row <= budget:
            return nb
    return 1


def _specs(f, t_mod, inner, nb=1):
    qspec = pl.BlockSpec((nb, f, inner), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((nb, t_mod * f, 2 * inner), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((nb, f, 2 * inner), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, gspec, fspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fusion_row_attention(heads, dh, t_mod, q, kv_grid, kv_f):
    return _fwd_impl(q, kv_grid, kv_f, heads, dh, t_mod)


def fusion_row_attention(q, kv_grid, kv_f, heads, dh):
    """q: [B, F, I]; kv_grid: [B, T*F, 2I] t-major; kv_f: [B, F, 2I].
    Returns [B, F, I] — softmax over the T+1 slots per fusion position,
    fusion-token kv as the last slot (FusionBlockFast's concat order)."""
    b, f, inner = q.shape
    t_mod = kv_grid.shape[1] // f
    return _fusion_row_attention(heads, dh, t_mod, q, kv_grid, kv_f)


def _fwd_impl(q, kv_grid, kv_f, heads, dh, t_mod):
    b, f, inner = q.shape
    scale = dh ** -0.5
    # per row: q + t-major grid + fusion kv in, o out (double buffered)
    nb = _batch_block(b, 2 * f * inner * (1 + 2 * t_mod + 2 + 1)
                      * q.dtype.itemsize)
    qspec, gspec, fspec = _specs(f, t_mod, inner, nb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_mod=t_mod, heads=heads, dh=dh,
                          scale=scale, nb=nb),
        grid=(b // nb,),
        compiler_params=_par(1),
        in_specs=[qspec, gspec, fspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret_mode(),
    )(q, kv_grid, kv_f)


def _fwd_rule(heads, dh, t_mod, q, kv_grid, kv_f):
    return _fwd_impl(q, kv_grid, kv_f, heads, dh, t_mod), (q, kv_grid, kv_f)


def _bwd_rule(heads, dh, t_mod, res, do):
    q, kv_grid, kv_f = res
    b, f, inner = q.shape
    scale = dh ** -0.5
    # per row: (q + grid + kv_f + do) in and (dq + dgrid + dkv_f) out
    nb = _batch_block(b, 2 * f * inner * (2 * (1 + 2 * t_mod + 2) + 1)
                      * q.dtype.itemsize)
    qspec, gspec, fspec = _specs(f, t_mod, inner, nb)
    dq, dkvg, dkvf = pl.pallas_call(
        functools.partial(_bwd_kernel, t_mod=t_mod, heads=heads, dh=dh,
                          scale=scale, nb=nb),
        grid=(b // nb,),
        compiler_params=_par(1),
        in_specs=[qspec, gspec, fspec, qspec],
        out_specs=(qspec, gspec, fspec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(kv_grid.shape, kv_grid.dtype),
            jax.ShapeDtypeStruct(kv_f.shape, kv_f.dtype),
        ),
        interpret=interpret_mode(),
    )(q, kv_grid, kv_f, do)
    return dq, dkvg, dkvf


_fusion_row_attention.defvjp(_fwd_rule, _bwd_rule)


def fusion_row_attention_xla(q, kv_grid, kv_f, heads, dh):
    """Pure-XLA reference with FusionBlockFast's original numerics (the
    transpose-and-stack formulation) — fallback and parity target."""
    b, f, inner = q.shape
    t_mod = kv_grid.shape[1] // f
    scale = dh ** -0.5
    qh = q.reshape(b, f, heads, dh)
    k_g, v_g = jnp.split(kv_grid.reshape(b, t_mod, f, 2 * inner), 2, axis=-1)
    k_g = k_g.reshape(b, t_mod, f, heads, dh).transpose(0, 2, 1, 3, 4)
    v_g = v_g.reshape(b, t_mod, f, heads, dh).transpose(0, 2, 1, 3, 4)
    k_f, v_f = jnp.split(kv_f.reshape(b, f, 2, heads, dh), 2, axis=2)
    k = jnp.concatenate([k_g, k_f], axis=2)  # [B, F, T+1, h, dh]
    v = jnp.concatenate([v_g, v_f], axis=2)
    sim = jnp.sum(
        (qh[:, :, None] * scale).astype(jnp.float32) * k.astype(jnp.float32),
        axis=-1,
    )  # [B, F, T+1, h]
    attn = jax.nn.softmax(sim, axis=2)
    out = jnp.sum(attn[..., None].astype(v.dtype) * v, axis=2)
    return out.reshape(b, f, inner).astype(q.dtype)


def fusion_row_attention_auto(q, kv_grid, kv_f, heads, dh):
    """Platform-resolved: Pallas when lowered for TPU, XLA elsewhere."""
    fn_tpu = functools.partial(fusion_row_attention, heads=heads, dh=dh)
    fn_xla = functools.partial(fusion_row_attention_xla, heads=heads, dh=dh)
    return jax.lax.platform_dependent(q, kv_grid, kv_f, tpu=fn_tpu,
                                      default=fn_xla)


def fusion_row_supported(f: int, t_mod: int, inner: int) -> bool:
    """Per-program working set: q/kv_f/kv_grid slabs + a few [F, dh] f32
    temporaries per unrolled slot; all lane slices are static dh-multiples.

    IMF_DISABLE_FUSION_ROW=1 forces the XLA fallback — ablation-timing knob
    only (tools/bench_ablate.py runs one process per variant)."""
    import os

    if os.environ.get("IMF_DISABLE_FUSION_ROW"):
        return False
    return (
        f % 8 == 0
        and inner % 8 == 0
        and t_mod <= 8
        and (t_mod + 1) * f * 2 * inner * 4 <= 10e6
    )
