"""Pallas TPU kernel: block-sparse zorro attention over type tiles.

The zorro mask (multimae_crossattn.py:431-447) lets a modality query attend
only to keys of its own type; only fusion queries see everything. The packed
layout groups tokens by type, so whole 128x128 tiles of the [N, N]
similarity are provably dead: at the flagship config (s1+s2, E=384, F=256,
N=640 -> 5x5 tiles) only ~17 of 25 tiles can ever be unmasked. The dense
packed kernel (ops/pallas_attn.py) still pays MXU+VPU for all 25.

Here tile activity is precomputed in XLA from cheap per-tile type summaries
(min/max type excluding PAD, has-fusion-query, any-valid-key — a
[B, nt, nt] bool for a few hundred bytes) and shipped to the kernel as an
SMEM operand; the kernel runs flash-style per (head, q-tile) with two
passes over ACTIVE k-tiles only — pass A: sim tile + running row max;
pass B: exp, denominator, and the p@V accumulation. Inactive tiles cost
nothing (no matmul, no exp). The predicate is conservative (range overlap
is necessary for type equality; diagonal tiles are always on so padding
rows stay finite), so results are identical to the dense kernel's
max-subtracted softmax up to fp associativity.

Backward mirrors the structure: recompute (m, sims) per q-tile over active
tiles, then flash gradients with dk/dv accumulated in f32 VMEM scratch
across q-tiles, all matmul operands bf16 with f32 accumulation. Grads come
back as one dqkv slab, as in the dense fused-qkv kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import interpret_mode

PAD_TYPE = 255
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
TILE = 128


def tile_active(types: jnp.ndarray, fusion_type: int, nt: int) -> jnp.ndarray:
    """[B, N] padded types -> [B, 1, nt*nt] int32 tile-activity matrix.

    active[i, j] = type ranges of q-tile i and k-tile j overlap (necessary
    for tq == tk), OR q-tile i holds a fusion query and k-tile j any valid
    key. The diagonal is always on, keeping PAD query rows finite (they
    attend their own tile exactly as in the dense kernel).
    """
    b = types.shape[0]
    tt = types.reshape(b, nt, TILE)
    pad = tt == PAD_TYPE
    big = jnp.int32(1 << 20)
    tmin = jnp.min(jnp.where(pad, big, tt), axis=-1)  # [B, nt]
    tmax = jnp.max(jnp.where(pad, -1, tt), axis=-1)
    qfus = jnp.any(tt == fusion_type, axis=-1)
    kvalid = jnp.any(~pad, axis=-1)
    overlap = ((tmin[:, :, None] <= tmax[:, None, :])
               & (tmin[:, None, :] <= tmax[:, :, None]))
    active = overlap | (qfus[:, :, None] & kvalid[:, None, :])
    active = active | jnp.eye(nt, dtype=bool)[None]
    # [B, 1, nt*nt]: the leading 1 keeps the SMEM block's trailing two dims
    # equal to the full array dims (Mosaic requires 8/128-divisible blocks
    # OR full-dim blocks; (1, nt*nt) alone fails the 8-divisibility check)
    return active.astype(jnp.int32).reshape(b, 1, nt * nt)


def _fwd_kernel(active_ref, types_ref, qkv_ref, o_ref,
                sim_s, m_s, d_s, acc_s, *, scale, fusion_type, heads, dh, nt):
    inner = heads * dh
    for h in range(heads):
        qsl = slice(h * dh, (h + 1) * dh)
        for i in range(nt):
            rows = slice(i * TILE, (i + 1) * TILE)
            tq = types_ref[0, 0, rows]
            q_t = qkv_ref[0, rows, qsl]  # [TILE, dh]
            m_s[...] = jnp.full_like(m_s[...], NEG_INF)
            for j in range(nt):
                @pl.when(active_ref[0, 0, i * nt + j] != 0)
                def _(i=i, j=j, tq=tq, q_t=q_t):
                    cols = slice(j * TILE, (j + 1) * TILE)
                    k_t = qkv_ref[0, cols, inner + h * dh:inner + (h + 1) * dh]
                    s = jax.lax.dot_general(
                        q_t, k_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale  # [TILE, TILE]
                    tk = types_ref[0, 0, cols]
                    allowed = (tq[:, None] == tk[None, :]) | (
                        (tq[:, None] == fusion_type) & (tk[None, :] != PAD_TYPE)
                    )
                    s = jnp.where(allowed, s, NEG_INF)
                    sim_s[:, cols] = s
                    m_s[...] = jnp.maximum(
                        m_s[...], jnp.max(s, axis=-1, keepdims=True))
            d_s[...] = jnp.zeros_like(d_s[...])
            acc_s[...] = jnp.zeros_like(acc_s[...])
            for j in range(nt):
                @pl.when(active_ref[0, 0, i * nt + j] != 0)
                def _(i=i, j=j):
                    cols = slice(j * TILE, (j + 1) * TILE)
                    p = jnp.exp(sim_s[:, cols] - m_s[...])
                    d_s[...] += jnp.sum(p, axis=-1, keepdims=True)
                    v_t = qkv_ref[0, cols,
                                  2 * inner + h * dh:2 * inner + (h + 1) * dh]
                    acc_s[...] += jnp.dot(
                        p.astype(v_t.dtype), v_t,
                        preferred_element_type=jnp.float32)
            o_ref[0, rows, qsl] = (acc_s[...] / d_s[...]).astype(o_ref.dtype)


def _bwd_kernel(active_ref, types_ref, qkv_ref, o_ref, do_ref, dqkv_ref,
                sim_s, m_s, d_s, dq_s, dk_acc, dv_acc,
                *, scale, fusion_type, heads, dh, nt):
    inner = heads * dh
    for h in range(heads):
        qsl = slice(h * dh, (h + 1) * dh)
        ksl = slice(inner + h * dh, inner + (h + 1) * dh)
        vsl = slice(2 * inner + h * dh, 2 * inner + (h + 1) * dh)
        dk_acc[...] = jnp.zeros_like(dk_acc[...])
        dv_acc[...] = jnp.zeros_like(dv_acc[...])
        for i in range(nt):
            rows = slice(i * TILE, (i + 1) * TILE)
            tq = types_ref[0, 0, rows]
            q_t = qkv_ref[0, rows, qsl]
            do_t = do_ref[0, rows, qsl]
            o_t = o_ref[0, rows, qsl]
            # pass A: recompute masked sim tiles + running row max
            m_s[...] = jnp.full_like(m_s[...], NEG_INF)
            for j in range(nt):
                @pl.when(active_ref[0, 0, i * nt + j] != 0)
                def _(i=i, j=j, tq=tq, q_t=q_t):
                    cols = slice(j * TILE, (j + 1) * TILE)
                    k_t = qkv_ref[0, cols, ksl]
                    s = jax.lax.dot_general(
                        q_t, k_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale
                    tk = types_ref[0, 0, cols]
                    allowed = (tq[:, None] == tk[None, :]) | (
                        (tq[:, None] == fusion_type) & (tk[None, :] != PAD_TYPE)
                    )
                    s = jnp.where(allowed, s, NEG_INF)
                    sim_s[:, cols] = s
                    m_s[...] = jnp.maximum(
                        m_s[...], jnp.max(s, axis=-1, keepdims=True))
            d_s[...] = jnp.zeros_like(d_s[...])
            for j in range(nt):
                @pl.when(active_ref[0, 0, i * nt + j] != 0)
                def _(i=i, j=j):
                    cols = slice(j * TILE, (j + 1) * TILE)
                    d_s[...] += jnp.sum(
                        jnp.exp(sim_s[:, cols] - m_s[...]),
                        axis=-1, keepdims=True)
            # pass B: flash gradients over active tiles
            dsum = jnp.sum(do_t.astype(jnp.float32) * o_t.astype(jnp.float32),
                           axis=-1, keepdims=True)  # [TILE, 1]
            dq_s[...] = jnp.zeros_like(dq_s[...])
            for j in range(nt):
                @pl.when(active_ref[0, 0, i * nt + j] != 0)
                def _(i=i, j=j, q_t=q_t, do_t=do_t, dsum=dsum):
                    cols = slice(j * TILE, (j + 1) * TILE)
                    k_t = qkv_ref[0, cols, ksl]
                    v_t = qkv_ref[0, cols, vsl]
                    p = jnp.exp(sim_s[:, cols] - m_s[...]) / d_s[...]
                    pb = p.astype(v_t.dtype)
                    dv_acc[cols, :] += jax.lax.dot_general(
                        pb, do_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dp = jax.lax.dot_general(
                        do_t, v_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ds = (p * (dp - dsum)).astype(q_t.dtype)
                    dq_s[...] += jnp.dot(
                        ds, k_t, preferred_element_type=jnp.float32) * scale
                    dk_acc[cols, :] += jax.lax.dot_general(
                        ds, q_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
            dqkv_ref[0, rows, qsl] = dq_s[...].astype(dqkv_ref.dtype)
        dqkv_ref[0, :, ksl] = dk_acc[...].astype(dqkv_ref.dtype)
        dqkv_ref[0, :, vsl] = dv_acc[...].astype(dqkv_ref.dtype)


def _specs(n, inner, nt):
    qkvspec = pl.BlockSpec((1, n, 3 * inner), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, n, inner), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, 1, nt * nt), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
    return qkvspec, ospec, tspec, aspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sparse_qkv(qkv, types, active, heads, scale, fusion_type):
    return _fwd_impl(qkv, types, active, heads, scale, fusion_type)


def _fwd_impl(qkv, types, active, heads, scale, fusion_type):
    b, n, three_i = qkv.shape
    inner = three_i // 3
    dh = inner // heads
    nt = n // TILE
    qkvspec, ospec, tspec, aspec = _specs(n, inner, nt)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, fusion_type=fusion_type,
                          heads=heads, dh=dh, nt=nt),
        grid=(b,),
        in_specs=[aspec, tspec, qkvspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, n, inner), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE, n), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, inner // heads), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(active, types, qkv)


def _fwd_rule(qkv, types, active, heads, scale, fusion_type):
    o = _fwd_impl(qkv, types, active, heads, scale, fusion_type)
    return o, (qkv, types, active, o)


def _bwd_rule(heads, scale, fusion_type, res, do):
    qkv, types, active, o = res
    b, n, three_i = qkv.shape
    inner = three_i // 3
    dh = inner // heads
    nt = n // TILE
    qkvspec, ospec, tspec, aspec = _specs(n, inner, nt)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, fusion_type=fusion_type,
                          heads=heads, dh=dh, nt=nt),
        grid=(b,),
        in_specs=[aspec, tspec, qkvspec, ospec, ospec],
        out_specs=qkvspec,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE, n), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, dh), jnp.float32),
            pltpu.VMEM((n, dh), jnp.float32),
            pltpu.VMEM((n, dh), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(active, types, qkv, o, do)
    return dqkv, None, None


_sparse_qkv.defvjp(_fwd_rule, _bwd_rule)


def zorro_sparse_attention_qkv(qkv, types, heads, fusion_type, scale=None):
    """Block-sparse fused-qkv zorro attention. qkv: [B, N, 3I] with
    N % 128 == 0; types: [B, N] int32 (PAD_TYPE = padding)."""
    b, n, three_i = qkv.shape
    inner = three_i // 3
    if scale is None:
        scale = (inner // heads) ** -0.5
    nt = n // TILE
    t32 = types.astype(jnp.int32)
    active = tile_active(t32, int(fusion_type), nt)
    return _sparse_qkv(qkv, t32[:, None, :], active, heads, scale,
                       int(fusion_type))


def zorro_sparse_supported(n: int) -> bool:
    """128-tiled rows; per-program working set = qkv slab + [TILE, N] sim
    scratch + 2 [N, dh] f32 accumulators. The python tile loops unroll
    nt^2 conditional blocks per head per pass, so nt is kept small to
    bound Mosaic compile size; larger N stays on the q-tiled dense kernel."""
    return n % TILE == 0 and 2 <= n // TILE <= 6


def zorro_sparse_attention_qkv_auto(qkv, types, heads, fusion_type,
                                    scale=None):
    """Platform-resolved: block-sparse Pallas on TPU, XLA masked SDPA
    elsewhere (same fallback math as the dense packed-qkv path)."""
    from .pallas_attn import _packed_qkv_xla

    def tpu_path(qkv, types):
        return zorro_sparse_attention_qkv(qkv, types, heads, fusion_type,
                                          scale)

    def xla_path(qkv, types):
        return _packed_qkv_xla(qkv, types, heads, fusion_type, scale)

    return jax.lax.platform_dependent(qkv, types, tpu=tpu_path,
                                      default=xla_path)
