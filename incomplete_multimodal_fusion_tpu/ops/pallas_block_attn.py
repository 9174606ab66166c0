"""Pallas TPU kernel: fully-fused encoder attention half-block (fwd + VJP).

Computes, in ONE kernel per batch row,

    y = x + to_out( zorro_attn( to_q(h), to_kv(h) ) ),
    h = LN_g2( LN_g1(x) )          (both norms bias-free)

i.e. the entire attention half of ``models.layers.EncoderBlock`` (reference
zorro_utils.py:227-240: block norm1 -> ZorroAttention's internal norm ->
q/kv projections -> masked attention -> out projection -> residual add).

Rationale (round-3 profile): with attention and FFN already fused, the
remaining per-layer XLA work was exactly this chain's intermediates
round-tripping HBM — norm1/norm outputs, the [B, N, 3I] qkv slab
(~44 MB/layer at the flagship shape) and the attention output feeding
to_out. Here every intermediate lives in VMEM; HBM traffic drops to
x / y / dy plus the (tiny) weights.

Weight gradients accumulate in f32 VMEM scratch across the sequential
batch grid and are written by the last program — the same pattern as
ops/pallas_ffn.py's backward. Matmul operands are bf16 with f32
accumulation (flash-backward practice, matches ops/pallas_attn.py); norm
statistics and softmax are f32. dtype rounds are inserted exactly where
the unfused module boundaries cast, so numerics match the XLA composition
(``fused_block_attn_xla``) to bf16 rounding.

Mask rule identical to ops/pallas_attn.py: attend iff same token type, or
the query is a fusion token; PAD_TYPE slots are never valid keys.
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
_EPS = 1e-5


def _ln_fwd(xf, g):
    """Bias-less LayerNorm on an f32 [N, D] slab. Returns (z, rstd, out_f32)
    with out = z * g, matching models.layers.BiaslessLayerNorm."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    z = (xf - mu) * rstd
    return z, rstd, z * g


def _ln_bwd(dout, z, rstd, g):
    """Backward of out = z * g for one slab: returns (dx, dgamma_partial)."""
    dg = jnp.sum(dout * z, axis=0)  # [D]
    dz = dout * g
    dx = (dz - jnp.mean(dz, axis=-1, keepdims=True)
          - z * jnp.mean(dz * z, axis=-1, keepdims=True)) * rstd
    return dx, dg


def _allowed(types, fusion_type):
    tq = types[:, None]
    tk = types[None, :]
    return (tq == tk) | ((tq == fusion_type) & (tk != PAD_TYPE))


def _double_norm(x, g1_ref, g2_ref):
    """norm1 -> attn-norm with the module-boundary bf16 round in between."""
    g1 = g1_ref[0].astype(jnp.float32)
    g2 = g2_ref[0].astype(jnp.float32)
    z1, r1, a_f = _ln_fwd(x.astype(jnp.float32), g1)
    a = a_f.astype(x.dtype)  # module-boundary round (norm1 output)
    z2, r2, h_f = _ln_fwd(a.astype(jnp.float32), g2)
    h = h_f.astype(x.dtype)
    return z1, r1, a, z2, r2, h


def _fwd_kernel(types_ref, x_ref, g1_ref, g2_ref, wq_ref, wkv_ref, wo_ref,
                y_ref, out_s, *, scale, fusion_type, heads, dh):
    x = x_ref[0]  # [N, D] bf16
    *_, h = _double_norm(x, g1_ref, g2_ref)
    q = jnp.dot(h, wq_ref[...], preferred_element_type=jnp.float32
                ).astype(x.dtype)  # [N, I]
    kv = jnp.dot(h, wkv_ref[...], preferred_element_type=jnp.float32
                 ).astype(x.dtype)  # [N, 2I]
    inner = heads * dh
    allowed = _allowed(types_ref[0, 0], fusion_type)
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        sim = jax.lax.dot_general(
            q[:, sl], kv[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        sim = jnp.where(allowed, sim, NEG_INF)
        p = jax.nn.softmax(sim, axis=-1)
        out_s[:, sl] = jnp.dot(
            p.astype(x.dtype), kv[:, inner + hh * dh:inner + (hh + 1) * dh],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    y_ref[0] = x + jnp.dot(out_s[...], wo_ref[...],
                           preferred_element_type=jnp.float32).astype(x.dtype)


def _bwd_kernel(types_ref, x_ref, g1_ref, g2_ref, wq_ref, wkv_ref, wo_ref,
                dy_ref,
                dx_ref, dg1_ref, dg2_ref, dwq_ref, dwkv_ref, dwo_ref,
                out_s, dq_s, dkv_s,
                dg1_acc, dg2_acc, dwq_acc, dwkv_acc, dwo_acc,
                *, scale, fusion_type, heads, dh):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    x = x_ref[0]
    z1, r1, a, z2, r2, h = _double_norm(x, g1_ref, g2_ref)
    q = jnp.dot(h, wq_ref[...], preferred_element_type=jnp.float32
                ).astype(x.dtype)
    kv = jnp.dot(h, wkv_ref[...], preferred_element_type=jnp.float32
                 ).astype(x.dtype)
    inner = heads * dh
    allowed = _allowed(types_ref[0, 0], fusion_type)
    dy = dy_ref[0]  # [N, D] bf16
    # y = x + out @ wo  =>  dout = dy @ wo^T ; dwo += out^T @ dy
    dout = jax.lax.dot_general(
        dy, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [N, I]
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        vsl = slice(inner + hh * dh, inner + (hh + 1) * dh)
        qh = q[:, sl]
        kh = kv[:, sl]
        vh = kv[:, vsl]
        doh = dout[:, sl]
        sim = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        sim = jnp.where(allowed, sim, NEG_INF)
        p = jax.nn.softmax(sim, axis=-1)  # [N, N] f32
        pb = p.astype(x.dtype)
        oh = jnp.dot(pb, vh, preferred_element_type=jnp.float32)  # [N, dh] f32
        out_s[:, sl] = oh.astype(x.dtype)
        # flash backward (bf16 operands, f32 accumulation)
        dv = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        d = jnp.sum(doh.astype(jnp.float32) * oh, axis=-1, keepdims=True)
        ds = (p * (dp - d)).astype(x.dtype)
        dq_s[:, sl] = (jnp.dot(ds, kh, preferred_element_type=jnp.float32)
                       * scale).astype(x.dtype)
        dkv_s[:, sl] = (jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(x.dtype)
        dkv_s[:, vsl] = dv.astype(x.dtype)
    dwo_t = jax.lax.dot_general(
        out_s[...], dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [I, D]
    # dh = dq @ wq^T + dkv @ wkv^T ; dwq += h^T dq ; dwkv += h^T dkv
    dwq_t = jax.lax.dot_general(
        h, dq_s[...], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwkv_t = jax.lax.dot_general(
        h, dkv_s[...], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dhid = (jax.lax.dot_general(
        dq_s[...], wq_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        dkv_s[...], wkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ))  # [N, D] f32
    g1 = g1_ref[0].astype(jnp.float32)
    g2 = g2_ref[0].astype(jnp.float32)
    da, dg2_t = _ln_bwd(dhid, z2, r2, g2)
    dx_ln, dg1_t = _ln_bwd(da, z1, r1, g1)
    dx_ref[0] = (dy.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg1_acc[...] = dg1_t[None]
        dg2_acc[...] = dg2_t[None]
        dwq_acc[...] = dwq_t
        dwkv_acc[...] = dwkv_t
        dwo_acc[...] = dwo_t

    @pl.when(i > 0)
    def _():
        dg1_acc[...] += dg1_t[None]
        dg2_acc[...] += dg2_t[None]
        dwq_acc[...] += dwq_t
        dwkv_acc[...] += dwkv_t
        dwo_acc[...] += dwo_t

    @pl.when(i == nprog - 1)
    def _():
        dg1_ref[...] = dg1_acc[...].astype(dg1_ref.dtype)
        dg2_ref[...] = dg2_acc[...].astype(dg2_ref.dtype)
        dwq_ref[...] = dwq_acc[...].astype(dwq_ref.dtype)
        dwkv_ref[...] = dwkv_acc[...].astype(dwkv_ref.dtype)
        dwo_ref[...] = dwo_acc[...].astype(dwo_ref.dtype)


def _specs(n, d, inner):
    xspec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    g = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wq = pl.BlockSpec((d, inner), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wkv = pl.BlockSpec((d, 2 * inner), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wo = pl.BlockSpec((inner, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return xspec, tspec, g, wq, wkv, wo


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(heads, fusion_type, x, types, g1, g2, wq, wkv, wo):
    return _fwd_impl(x, types, g1, g2, wq, wkv, wo, heads, fusion_type)


def _types3(types):
    t = types.astype(jnp.int32)
    return t[:, None, :] if t.ndim == 2 else t


def fused_block_attn(x, types, g1, g2, wq, wkv, wo, heads, fusion_type):
    """x: [B, N, D]; types: [B, N] (or [B, 1, N]) int32, PAD_TYPE = padding;
    g1/g2: [1, D]; wq: [D, I]; wkv: [D, 2I]; wo: [I, D]."""
    return _fused(heads, int(fusion_type), x, _types3(types), g1, g2, wq, wkv, wo)


def _fwd_impl(x, types, g1, g2, wq, wkv, wo, heads, fusion_type):
    b, n, d = x.shape
    inner = wq.shape[1]
    dh = inner // heads
    scale = dh ** -0.5
    xspec, tspec, gs, wqs, wkvs, wos = _specs(n, d, inner)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, fusion_type=fusion_type,
                          heads=heads, dh=dh),
        grid=(b,),
        in_specs=[tspec, xspec, gs, gs, wqs, wkvs, wos],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((n, inner), x.dtype)],
        interpret=interpret_mode(),
    )(types, x, g1, g2, wq, wkv, wo)


def _fwd_rule(heads, fusion_type, x, types, g1, g2, wq, wkv, wo):
    y = _fwd_impl(x, types, g1, g2, wq, wkv, wo, heads, fusion_type)
    return y, (x, types, g1, g2, wq, wkv, wo)


def _bwd_rule(heads, fusion_type, res, dy):
    x, types, g1, g2, wq, wkv, wo = res
    b, n, d = x.shape
    inner = wq.shape[1]
    dh = inner // heads
    scale = dh ** -0.5
    xspec, tspec, gs, wqs, wkvs, wos = _specs(n, d, inner)
    dx, dg1, dg2, dwq, dwkv, dwo = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, fusion_type=fusion_type,
                          heads=heads, dh=dh),
        grid=(b,),
        in_specs=[tspec, xspec, gs, gs, wqs, wkvs, wos, xspec],
        out_specs=(xspec, gs, gs, wqs, wkvs, wos),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(g1.shape, g1.dtype),
            jax.ShapeDtypeStruct(g2.shape, g2.dtype),
            jax.ShapeDtypeStruct(wq.shape, wq.dtype),
            jax.ShapeDtypeStruct(wkv.shape, wkv.dtype),
            jax.ShapeDtypeStruct(wo.shape, wo.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, inner), x.dtype),
            pltpu.VMEM((n, inner), x.dtype),
            pltpu.VMEM((n, 2 * inner), x.dtype),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d, inner), jnp.float32),
            pltpu.VMEM((d, 2 * inner), jnp.float32),
            pltpu.VMEM((inner, d), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(types, x, g1, g2, wq, wkv, wo, dy)
    return dx, None, dg1, dg2, dwq, dwkv, dwo


_fused.defvjp(_fwd_rule, _bwd_rule)


def fused_block_attn_xla(x, types, g1, g2, wq, wkv, wo, heads, fusion_type):
    """Pure-XLA composition with identical numerics — the fallback branch
    for non-TPU lowering and the parity target for tests."""
    b, n, d = x.shape
    inner = wq.shape[1]
    dh = inner // heads
    scale = dh ** -0.5

    def ln(t, g):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.var(tf, axis=-1, keepdims=True)
        z = (tf - mu) * jax.lax.rsqrt(var + _EPS)
        return (z * g.astype(jnp.float32)).astype(t.dtype)

    h = ln(ln(x, g1[0]), g2[0])
    q = jnp.dot(h, wq).reshape(b, n, heads, dh)
    kv = jnp.dot(h, wkv)
    k = kv[..., :inner].reshape(b, n, heads, dh)
    v = kv[..., inner:].reshape(b, n, heads, dh)
    t = _types3(types)[:, 0]
    allowed = (t[:, :, None] == t[:, None, :]) | (
        (t[:, :, None] == fusion_type) & (t[:, None, :] != PAD_TYPE)
    )
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                     preferred_element_type=jnp.float32) * scale
    sim = jnp.where(allowed[:, None], sim, NEG_INF)
    p = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", p.astype(x.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, n, inner)
    return x + jnp.dot(out, wo).astype(x.dtype)


def fused_block_attn_auto(x, types, g1, g2, wq, wkv, wo, heads, fusion_type):
    """Platform-resolved: Pallas when lowered for TPU, XLA elsewhere (same
    rationale as pallas_attn.zorro_self_attention_auto)."""
    fn_tpu = functools.partial(fused_block_attn, heads=heads,
                               fusion_type=fusion_type)
    fn_xla = functools.partial(fused_block_attn_xla, heads=heads,
                               fusion_type=fusion_type)
    return jax.lax.platform_dependent(
        x, types, g1, g2, wq, wkv, wo, tpu=fn_tpu, default=fn_xla
    )


def block_attn_supported(n: int, d: int, inner: int) -> bool:
    """Whole-slab kernel: per-program working set is dominated by the
    [N, N] f32 sim + ~8 [N, D/I] slabs; conservatively bound to VMEM.
    Lane-axis head slices need 64-alignment (static slices)."""
    return (
        n <= 768 and n % 8 == 0
        and inner % 64 == 0
        and (n * n * 4 + 12 * n * max(d, inner) * 4
             + 3 * d * inner * 2) <= 14e6
    )
