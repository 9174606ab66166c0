"""Pallas TPU kernel: batched bilinear point sampling (fwd + custom VJP).

``point_sample`` (detectron2 semantics; reference utils/point_features.py
point_sample / matcher_ins.py:116-129 / criterion_ins.py:171-221) is the
downstream criterion's hot op: every matching + PointRend loss evaluates
masks at ~12k random points, and the gather-based formulation cost ~600 ms
PER CALL on TPU (measured — ~24 such calls made the train step 14.3 s).

Bilinear sampling is a separable bilinear form:

    S[p] = hat_y(py[p], ·) @ M @ hat_x(px[p], ·)^T

so for a tile of TP points the kernel builds the two hat factors
[H, TP] / [W, TP] from iota compares in VMEM and evaluates

    t2 = M @ hx            # [H, TP]  (MXU)
    S  = sum_h hy * t2     # [1, TP]  (VPU sublane reduce)

— no gathers anywhere. Backward reuses the factors:

    dpy = dS * sum_h dhat_y * t2
    dpx = dS * sum_w dhat_x * (M^T hy)
    dM += (hy * dS) @ hx^T            # accumulated across point tiles

Layout note: points live on the LANE axis — coords ship as [N, 2, P] and
samples as [N, 1, P]. A [N, P, 1] column layout would be tile-padded
1 -> 128 lanes in HBM (a 128x memory blowup; observed as a 22 GB allocation
at PointRend sizes).

Zero padding outside the grid matches grid_sample(align_corners=False):
the hat support decays past the border exactly like the 4-corner weights.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import dhat as _dhat
from .pallas_common import hat as _hat
from .pallas_common import interpret_mode as _interpret


def _iota_col(k: int, tp: int):
    """[K, TP] row-index plane."""
    return jax.lax.broadcasted_iota(jnp.int32, (k, tp), 0).astype(jnp.float32)


def _fwd_kernel(pyx_ref, m_ref, o_ref, *, h, w):
    py = pyx_ref[0, 0:1, :]  # [1, TP]
    px = pyx_ref[0, 1:2, :]
    m = m_ref[0].astype(jnp.float32)  # [H, W]
    tp = py.shape[1]
    hy = _hat(py, _iota_col(h, tp))  # [H, TP]
    hx = _hat(px, _iota_col(w, tp))  # [W, TP]
    t2 = jnp.dot(m, hx, preferred_element_type=jnp.float32)  # [H, TP]
    o_ref[0] = jnp.sum(hy * t2, axis=0, keepdims=True).astype(o_ref.dtype)


def _bwd_kernel(pyx_ref, m_ref, ds_ref, dm_ref, dpyx_ref, dm_acc, *, h, w):
    j = pl.program_id(1)
    nprog = pl.num_programs(1)
    py = pyx_ref[0, 0:1, :]
    px = pyx_ref[0, 1:2, :]
    m = m_ref[0].astype(jnp.float32)
    ds = ds_ref[0]  # [1, TP]
    tp = py.shape[1]
    yy = _iota_col(h, tp)
    xx = _iota_col(w, tp)
    hy = _hat(py, yy)  # [H, TP]
    hx = _hat(px, xx)  # [W, TP]
    t2 = jnp.dot(m, hx, preferred_element_type=jnp.float32)  # [H, TP]
    tx = jax.lax.dot_general(m, hy, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [W, TP]
    dpy = ds * jnp.sum(_dhat(py, yy) * t2, axis=0, keepdims=True)
    dpx = ds * jnp.sum(_dhat(px, xx) * tx, axis=0, keepdims=True)
    dpyx_ref[0, 0:1, :] = dpy.astype(dpyx_ref.dtype)
    dpyx_ref[0, 1:2, :] = dpx.astype(dpyx_ref.dtype)
    dm_t = jax.lax.dot_general(hy * ds, hx, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [H, W]

    @pl.when(j == 0)
    def _():
        dm_acc[...] = dm_t

    @pl.when(j > 0)
    def _():
        dm_acc[...] += dm_t

    @pl.when(j == nprog - 1)
    def _():
        dm_ref[0] = dm_acc[...].astype(dm_ref.dtype)


def _pt_tile(p: int) -> int:
    if p >= 2048:
        return 2048
    return -(-p // 128) * 128  # lane-axis tiles are 128-multiples


def _specs(tp: int, h: int, w: int):
    cspec = pl.BlockSpec((1, 2, tp), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, tp), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    return cspec, sspec, mspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample_px(masks, pyx, h, w):
    """masks [N, H, W]; pyx [N, 2, P_pad] pixel coords (y row 0, x row 1)
    -> [N, 1, P_pad] float32."""
    out, _ = _sample_px_fwd(masks, pyx, h, w)
    return out


def _sample_px_fwd(masks, pyx, h, w):
    n, _, p_pad = pyx.shape
    tp = _pt_tile(p_pad)
    assert p_pad % tp == 0, (p_pad, tp)
    cspec, sspec, mspec = _specs(tp, h, w)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w),
        grid=(n, p_pad // tp),
        in_specs=[cspec, mspec],
        out_specs=sspec,
        out_shape=jax.ShapeDtypeStruct((n, 1, p_pad), jnp.float32),
        interpret=_interpret(),
    )(pyx, masks)
    return out, (masks, pyx)


def _sample_px_bwd(h, w, res, ds):
    masks, pyx = res
    n, _, p_pad = pyx.shape
    tp = _pt_tile(p_pad)
    cspec, sspec, mspec = _specs(tp, h, w)
    dm, dpyx = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w),
        grid=(n, p_pad // tp),
        in_specs=[cspec, mspec, sspec],
        out_specs=(mspec, cspec),
        out_shape=(
            jax.ShapeDtypeStruct(masks.shape, masks.dtype),
            jax.ShapeDtypeStruct(pyx.shape, jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        interpret=_interpret(),
    )(pyx, masks, ds)
    return dm, dpyx


_sample_px.defvjp(_sample_px_fwd, _sample_px_bwd)


def point_sample_pallas(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """masks [N, H, W], coords [N, P, 2] in [0, 1] (x, y) -> [N, P] f32.
    detectron2 point_sample(align_corners=False) semantics."""
    n, h, w = masks.shape
    p = coords.shape[1]
    px = coords[..., 0].astype(jnp.float32) * w - 0.5
    py = coords[..., 1].astype(jnp.float32) * h - 0.5
    tp = _pt_tile(p)
    p_pad = -(-p // tp) * tp
    pyx = jnp.stack([py, px], axis=1)  # [N, 2, P]
    pyx = jnp.pad(pyx, ((0, 0), (0, 0), (0, p_pad - p)))
    out = _sample_px(masks, pyx, h, w)
    return out[:, 0, :p]
