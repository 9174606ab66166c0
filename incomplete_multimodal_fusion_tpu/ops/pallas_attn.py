"""Pallas TPU kernel: fused Zorro-masked self-attention (forward + custom VJP).

The encoder's hot op (reference zorro_utils.py:184-194 materializes the
[B, H, N, N] similarity matrix and a boolean mask in HBM). This kernel keeps
logits, mask and softmax entirely in VMEM: the mask is *recomputed from the
packed token types* inside the kernel — two integer compares — so the only
HBM traffic is q/k/v/out slabs.

Mask rule (multimae_crossattn.py:431-447): attend iff same token type, or the
query is a fusion token; padding slots carry ``PAD_TYPE`` so modality queries
never match them and the fusion row explicitly excludes them.

Per-(batch, head) program: at N ~ 640-1280 and dh = 64 the whole slab fits
VMEM (sim: N^2 * 4B <= 6.6 MB), so no streaming is needed; larger N falls
back to the XLA path (ops.attention.multihead_attention).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_TYPE = 255
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# largest N whose backward working set (~4 N^2 f32 buffers) fits VMEM
MAX_PALLAS_TOKENS = 1024


def _allowed(types: jnp.ndarray, fusion_type: int) -> jnp.ndarray:
    tq = types[:, None]
    tk = types[None, :]
    return (tq == tk) | ((tq == fusion_type) & (tk != PAD_TYPE))


def _fwd_kernel(types_ref, q_ref, k_ref, v_ref, o_ref, *, scale, fusion_type):
    t = types_ref[0, 0]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    sim = jnp.where(_allowed(t, fusion_type), sim, NEG_INF)
    p = jax.nn.softmax(sim, axis=-1)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(types_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, fusion_type):
    t = types_ref[0, 0]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    sim = jnp.where(_allowed(t, fusion_type), sim, NEG_INF)
    p = jax.nn.softmax(sim, axis=-1)  # [N, N] f32
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = jnp.sum(do * o, axis=-1, keepdims=True)  # [N, 1]
    ds = p * (dp - d)
    dq_ref[0] = (jnp.dot(ds, k.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)


def _specs(bh: int, n: int, dh: int, heads: int):
    # types arrive as [B, 1, N] so the block's trailing two dims (1, N) match
    # the array dims exactly (Mosaic block-shape constraint)
    qspec = pl.BlockSpec((1, n, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 1, n), lambda i: (i // heads, 0, 0), memory_space=pltpu.VMEM)
    return qspec, tspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _zorro_attention_bhnd(q, k, v, types, heads, scale, fusion_type):
    """q/k/v: [B*H, N, dh]; types: [B, 1, N] int32 (PAD_TYPE = padding)."""
    bh, n, dh = q.shape
    qspec, tspec = _specs(bh, n, dh, heads)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, fusion_type=fusion_type),
        grid=(bh,),
        in_specs=[tspec, qspec, qspec, qspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(types, q, k, v)


def _fwd(q, k, v, types, heads, scale, fusion_type):
    o = _zorro_attention_bhnd(q, k, v, types, heads, scale, fusion_type)
    return o, (q, k, v, types, o)


def _bwd(heads, scale, fusion_type, res, do):
    q, k, v, types, o = res
    bh, n, dh = q.shape
    qspec, tspec = _specs(bh, n, dh, heads)
    interpret = jax.default_backend() != "tpu"
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, fusion_type=fusion_type),
        grid=(bh,),
        in_specs=[tspec, qspec, qspec, qspec, qspec, qspec],
        out_specs=(qspec, qspec, qspec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(types, q, k, v, o, do)
    return dq, dk, dv, None


_zorro_attention_bhnd.defvjp(_fwd, _bwd)


def zorro_self_attention(
    q: jnp.ndarray,  # [B, N, H, dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    types: jnp.ndarray,  # [B, N] int32; invalid slots must carry PAD_TYPE
    fusion_type: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Fused zorro-masked self-attention; returns [B, N, H, dh]."""
    b, n, h, dh = q.shape
    if scale is None:
        scale = dh ** -0.5

    def to_bhnd(t):
        return t.transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    out = _zorro_attention_bhnd(
        to_bhnd(q), to_bhnd(k), to_bhnd(v),
        types.astype(jnp.int32)[:, None, :], h, scale, int(fusion_type),
    )
    return out.reshape(b, h, n, dh).transpose(0, 2, 1, 3)


def pallas_supported(n: int) -> bool:
    return n <= MAX_PALLAS_TOKENS


def zorro_self_attention_auto(
    q: jnp.ndarray,  # [B, N, H, dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    types: jnp.ndarray,  # [B, N] int32; invalid slots must carry PAD_TYPE
    fusion_type: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Platform-resolved zorro attention: the fused Pallas kernel when the
    computation is *lowered for TPU*, the XLA masked-SDPA fallback elsewhere.

    ``jax.lax.platform_dependent`` picks the branch per lowering platform, so
    this is safe even when a TPU-default-backend process compiles for CPU
    devices (the driver's virtual-CPU multichip dryrun) — gating on
    ``jax.default_backend()`` was not (it emitted a compiled Pallas call onto
    the CPU backend, which only supports interpret mode).
    """
    from .attention import multihead_attention, zorro_mask_from_padded_types

    def tpu_path(q, k, v, types):
        return zorro_self_attention(q, k, v, types, fusion_type, scale)

    def xla_path(q, k, v, types):
        mask = zorro_mask_from_padded_types(types, fusion_type, PAD_TYPE)[:, None]
        return multihead_attention(q, k, v, mask=mask, scale=scale)

    return jax.lax.platform_dependent(
        q, k, v, types, tpu=tpu_path, default=xla_path
    )


def resolve_attn_mode(attn_impl: str, n: int):
    """Map a config ``attn_impl`` to the block-level attention mode.

    Returns True ('pallas' forced), False (XLA fallback), or the string
    "auto" — resolved to Pallas-on-TPU / XLA-elsewhere at lowering time via
    ``zorro_self_attention_auto``.
    """
    if attn_impl == "pallas":
        return True
    if attn_impl == "auto" and pallas_supported(n):
        return "auto"
    return False
