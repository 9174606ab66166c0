"""Pallas TPU kernel: fused multi-scale deformable attention (fwd + VJP).

TPU-native replacement for the reference's C++/CUDA extension
(downstream/*/modeling/pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh:
1-1331, ms_deform_attn_cuda.cu:1-157). Numeric parity target is the
reference's *live* path, the grid_sample fallback
(ms_deform_attn_func.py:52-77) == ``ops.msda.ms_deform_attn_core``
(tested in tests/test_pallas_msda.py, the role ops/test.py plays for CUDA).

Design — per-point gathers are TPU-hostile, so the bilinear sample is
reformulated as an MXU matmul against an implicit sparse weight matrix
recomputed in VMEM:

  For one level with value grid ``v`` [H*W, D] and a tile of sampling points
  at pixel coords (px, py), the bilinear weight of grid cell (h, w) is the
  separable hat product  max(0, 1-|py-h|) * max(0, 1-|px-w|)  — exactly the
  4-corner bilinear weights, with grid_sample's zero padding emerging
  naturally as the hat decays past the border. So

      sampled[r, :] = W[r, :] @ v,     W[r, hw] = hat_y(r, h) * hat_x(r, w)

  W ([rows, H*W], 4 nonzeros per row) is built from iota compares — no HBM
  traffic, and the "gather" runs at MXU speed. The per-query reduction over
  the P sampling points is a second tiny matmul against a constant banded
  matrix  band[i, j] = 1{j // P == i}, so the kernel contains no transposes
  or layout-changing reshapes at all; attention weights fold in as a
  lane-broadcast column multiply.

The backward pass reuses the same structure (all MXU):
    dV   = W^T @ (aw * band^T dOut)
    dW   = (aw * band^T dOut) @ v^T
    dpy  = sum_hw dW * hat_x * dhat_y      (dhat = -sign inside the support)
    dpx  = sum_hw dW * hat_y * dhat_x
    daw  = sum_d (band^T dOut) * (W @ v)

One pallas_call per pyramid level; the level-sum happens in XLA (L adds).
The [0,1]->pixel affine conversion and its gradient live outside the kernel
as plain JAX, so only the pixel-space level op needs the custom VJP.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat(coord, idx):
    """Bilinear hat weights max(0, 1 - |coord - idx|); coord [rows, 1]
    broadcasts against the iota plane idx [rows, hw]."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord - idx))


def _dhat(coord, idx):
    """d(hat)/d(coord): -sign(coord - idx) on the open support |.| < 1."""
    diff = coord - idx
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)


def _grids(rows: int, h: int, w: int):
    """Integer y/x coordinate planes, [rows, h*w] float32."""
    cell = jax.lax.broadcasted_iota(jnp.int32, (rows, h * w), 1)
    return (cell // w).astype(jnp.float32), (cell % w).astype(jnp.float32)


def _band(q: int, rows: int):
    """Constant banded P-reduction matrix band[i, j] = 1{j // P == i}."""
    p = rows // q
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (q, rows), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (q, rows), 1)
    return ((j_ids // p) == i_ids).astype(jnp.float32)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(py_ref, px_ref, aw_ref, v_ref, o_ref, *, h, w, p):
    py = py_ref[0]  # [rows, 1]
    px = px_ref[0]
    aw = aw_ref[0]  # [rows, 1]
    v = v_ref[0].astype(jnp.float32)  # [h*w, d]
    rows = py.shape[0]
    yy, xx = _grids(rows, h, w)
    wts = _hat(py, yy) * _hat(px, xx)  # [rows, hw]
    s = _dot(wts, v, (((1,), (0,))))  # [rows, d]
    s = s * aw  # fold attention weights (lane-broadcast column)
    o_ref[0] = _dot(_band(rows // p, rows), s, (((1,), (0,)))).astype(o_ref.dtype)


def _bwd_kernel(py_ref, px_ref, aw_ref, v_ref, do_ref,
                dv_ref, dpy_ref, dpx_ref, daw_ref, *, h, w, p):
    py = py_ref[0]
    px = px_ref[0]
    aw = aw_ref[0]
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)  # [q, d]
    rows = py.shape[0]
    yy, xx = _grids(rows, h, w)
    hy = _hat(py, yy)
    hx = _hat(px, xx)
    wts = hy * hx  # [rows, hw]

    g = _dot(_band(rows // p, rows), do, (((0,), (0,))))  # band^T dOut [rows, d]
    g_aw = g * aw
    # dV: accumulate across query tiles (sequential grid revisits the block)
    dv = _dot(wts, g_aw, (((0,), (0,))))  # [hw, d]
    qt = pl.program_id(1)

    @pl.when(qt == 0)
    def _():
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(qt != 0)
    def _():
        dv_ref[0] = (dv_ref[0].astype(jnp.float32) + dv).astype(dv_ref.dtype)

    dw = _dot(g_aw, v, (((1,), (1,))))  # [rows, hw]
    dpy_ref[0] = jnp.sum(dw * hx * _dhat(py, yy), axis=1, keepdims=True
                         ).astype(dpy_ref.dtype)
    dpx_ref[0] = jnp.sum(dw * hy * _dhat(px, xx), axis=1, keepdims=True
                         ).astype(dpx_ref.dtype)
    s = _dot(wts, v, (((1,), (0,))))  # recomputed sample [rows, d]
    daw_ref[0] = jnp.sum(g * s, axis=1, keepdims=True).astype(daw_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lq_tile(hw: int, p: int) -> int:
    """Query-tile size: keep each [rows, hw] f32 plane within ~1 MB. The
    BACKWARD kernel holds ~8 such planes (yy/xx/hy/hx/wts/dw + grads); the
    old 2 MB budget with a 256-row floor hit the 16 MB scoped-VMEM limit at
    the (64, 64) pyramid level (16.45 MB, tpu_compile_helper OOM — verified
    on-device at the batch-30 downstream step)."""
    rows_budget = max(8, min(512, (1024 * 1024) // (4 * max(hw, 1))))
    return max(2, rows_budget // p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _msda_level(v, py, px, aw, h, w, p):
    """One pyramid level in pixel space.

    v: [BM, h*w, D]; py/px/aw: [BM, LqPad*P, 1] (p-minor row order, padded
    rows must carry aw == 0). Returns [BM, LqPad, D] float32.
    """
    out, _ = _msda_level_fwd(v, py, px, aw, h, w, p)
    return out


def _specs(bm, hw, d, rows, q):
    col = lambda rr: pl.BlockSpec((1, rr, 1), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, hw, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    return col(rows), vspec, ospec


def _msda_level_fwd(v, py, px, aw, h, w, p):
    bm, hw, d = v.shape
    rows_total = py.shape[1]
    lq_t = _lq_tile(hw, p)
    rows = lq_t * p
    n_qt = rows_total // rows
    assert n_qt * rows == rows_total, (rows_total, rows)
    colspec, vspec, ospec = _specs(bm, hw, d, rows, lq_t)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, p=p),
        grid=(bm, n_qt),
        in_specs=[colspec, colspec, colspec, vspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((bm, rows_total // p, d), jnp.float32),
        interpret=_interpret(),
    )(py, px, aw, v)
    return out, (v, py, px, aw)


def _msda_level_bwd(h, w, p, res, dout):
    v, py, px, aw = res
    bm, hw, d = v.shape
    rows_total = py.shape[1]
    lq_t = _lq_tile(hw, p)
    rows = lq_t * p
    n_qt = rows_total // rows
    colspec, vspec, _ = _specs(bm, hw, d, rows, lq_t)
    dospec = pl.BlockSpec((1, lq_t, d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    dvspec = pl.BlockSpec((1, hw, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dv, dpy, dpx, daw = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, p=p),
        grid=(bm, n_qt),
        in_specs=[colspec, colspec, colspec, vspec, dospec],
        out_specs=(dvspec, colspec, colspec, colspec),
        out_shape=(
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(py.shape, jnp.float32),
            jax.ShapeDtypeStruct(px.shape, jnp.float32),
            jax.ShapeDtypeStruct(aw.shape, jnp.float32),
        ),
        interpret=_interpret(),
    )(py, px, aw, v, dout)
    return dv, dpy, dpx, daw


_msda_level.defvjp(_msda_level_fwd, _msda_level_bwd)


def ms_deform_attn_pallas(
    value: jnp.ndarray,  # [B, S, M, D] flattened levels
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W), ...]
    sampling_locations: jnp.ndarray,  # [B, Lq, M, L, P, 2] in [0, 1]
    attention_weights: jnp.ndarray,  # [B, Lq, M, L, P]
) -> jnp.ndarray:
    """Drop-in for ``ops.msda.ms_deform_attn_core``; returns [B, Lq, M*D]."""
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert l == len(spatial_shapes)
    v_bm = value.transpose(0, 2, 1, 3).reshape(b * m, s, d)

    offsets = [0]
    for hh, ww in spatial_shapes:
        offsets.append(offsets[-1] + hh * ww)
    assert offsets[-1] == s

    # pad the query count to a common multiple of every level's tile size
    # (padded rows carry aw = 0, so they contribute exactly zero)
    import math

    lcm = 1
    for hh, ww in spatial_shapes:
        t = _lq_tile(hh * ww, p)
        lcm = lcm * t // math.gcd(lcm, t)
    lq_pad = -(-lq // lcm) * lcm

    out = jnp.zeros((b * m, lq_pad, d), jnp.float32)
    for lid, (hh, ww) in enumerate(spatial_shapes):
        v_l = v_bm[:, offsets[lid] : offsets[lid + 1]]
        loc = sampling_locations[:, :, :, lid]  # [B, Lq, M, P, 2]
        # grid_sample align_corners=False: pixel = loc * size - 0.5
        px = loc[..., 0].astype(jnp.float32) * ww - 0.5
        py = loc[..., 1].astype(jnp.float32) * hh - 0.5
        aw = attention_weights[:, :, :, lid].astype(jnp.float32)  # [B,Lq,M,P]

        def rows(x):  # [B, Lq, M, P] -> [BM, lq_pad*P, 1], p-minor
            x = x.transpose(0, 2, 1, 3).reshape(b * m, lq, p)
            x = jnp.pad(x, ((0, 0), (0, lq_pad - lq), (0, 0)))
            return x.reshape(b * m, lq_pad * p, 1)

        out = out + _msda_level(v_l, rows(py), rows(px), rows(aw), hh, ww, p)
    out = out[:, :lq].reshape(b, m, lq, d).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, m * d).astype(value.dtype)


def ms_deform_attn_auto(value, spatial_shapes, sampling_locations,
                        attention_weights):
    """Platform-resolved MSDA core: the Pallas hat-matmul kernel when lowered
    for TPU, the XLA gather core elsewhere (same contract as
    ops.pallas_attn.zorro_self_attention_auto)."""
    from .msda import ms_deform_attn_core

    shapes = tuple(spatial_shapes)

    def tpu_path(v, l, a):
        return ms_deform_attn_pallas(v, shapes, l, a)

    def xla_path(v, l, a):
        return ms_deform_attn_core(v, shapes, l, a)

    return jax.lax.platform_dependent(
        value, sampling_locations, attention_weights,
        tpu=tpu_path, default=xla_path,
    )
