"""Decompose the two hottest Pallas kernels' time into MXU vs VPU stages on
the real chip (round-5 roofline follow-up: the per-op table shows
zorro_attn_fwd/bwd and geglu_ffn_fwd/bwd at 33-56% of their shape-aware
bounds; this tool measures WHERE the other half goes).

Timing through the axon tunnel: naive dispatch loops measure the tunnel
(~1.2 ms/dispatch, 36 ms/fetch), so each measurement jits ONE program that
runs the kernel K times in a lax.fori_loop (output chained back into the
input so iterations serialize), hard-syncs with a float() fetch, and takes
the difference between K2=192 and K1=64 iterations: per-call time =
(t(K2) - t(K1)) / (K2 - K1). RTT, compile residue, and the chain's
bookkeeping cancel in the difference.

For the GEGLU FFN it times experimental kernel variants with VPU stages
stripped one at a time (LayerNorm -> identity, GELU -> identity, both) —
same shapes, same grid, same DMA pattern, so the deltas isolate the VPU
stages. For attention it times the real kernel next to XLA bf16
batched-matmul ceilings of the same shapes (qk^T + av, with/without
softmax/mask).

Usage: python tools/bench_kernel_decompose.py [--which all|ffn|attn]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incomplete_multimodal_fusion_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from incomplete_multimodal_fusion_tpu.ops import pallas_attn, pallas_ffn
from incomplete_multimodal_fusion_tpu.ops.pallas_ffn import (
    _gelu_parts, _norm_fwd, _row_tile, _specs,
)

K1, K2 = 64, 192


def timed_chain(step_fn, x0, *consts, reps=3):
    """Per-call ms of ``step_fn(x) -> x`` via two-K fori_loop differencing.
    ``step_fn`` must be shape-preserving in its first argument."""

    def run(k):
        @jax.jit
        def prog(x, *cs):
            return jax.lax.fori_loop(0, k, lambda i, xx: step_fn(xx, *cs), x)

        out = prog(x0, *consts)
        float(jnp.sum(out.astype(jnp.float32)))  # hard sync (tunnel)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = prog(x0, *consts)
            float(jnp.sum(out.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = run(K1), run(K2)
    return (t2 - t1) / (K2 - K1) * 1e3


# --------------------------------------------------------------------------
# GEGLU FFN variants: flags strip VPU stages while keeping shapes/grid/DMA
# --------------------------------------------------------------------------


def _fwd_kernel_flags(x_ref, gamma_ref, win_ref, wout_ref, y_ref, *, inner,
                      do_norm, do_gelu):
    x = x_ref[...]
    if do_norm:
        _, _, xn_f = _norm_fwd(x, gamma_ref[...])
        xn = xn_f.astype(x.dtype)
    else:
        xn = x
    u = jnp.dot(xn, win_ref[...], preferred_element_type=jnp.float32)
    val = u[:, :inner]
    gate = u[:, inner:]
    if do_gelu:
        gv, _ = _gelu_parts(gate)
        a = val * gv
    else:
        a = val + gate  # keep both halves live, no transcendental
    y_ref[...] = jnp.dot(a.astype(x.dtype), wout_ref[...],
                         preferred_element_type=jnp.float32).astype(y_ref.dtype)


def _fwd_kernel_piped(x_ref, gamma_ref, win_ref, wout_ref, y_ref, *, inner,
                      chunks):
    """Software-pipelined fwd: the row tile is processed in ``chunks``
    independent sub-tiles whose op order interleaves sub-tile c+1's matmul1
    (MXU) with sub-tile c's GELU (VPU) — if Mosaic schedules the units
    independently, the VPU stages hide under the matmuls."""
    x = x_ref[...]
    tm = x.shape[0]
    step = tm // chunks
    gamma = gamma_ref[...]
    win = win_ref[...]
    wout = wout_ref[...]
    us = []
    for c in range(chunks):
        xc = x[c * step:(c + 1) * step]
        _, _, xn_f = _norm_fwd(xc, gamma)
        us.append(jnp.dot(xn_f.astype(x.dtype), win,
                          preferred_element_type=jnp.float32))
    for c in range(chunks):
        u = us[c]
        val, gate = u[:, :inner], u[:, inner:]
        gv, _ = _gelu_parts(gate)
        a = (val * gv).astype(x.dtype)
        y_ref[c * step:(c + 1) * step, :] = jnp.dot(
            a, wout, preferred_element_type=jnp.float32).astype(y_ref.dtype)


def geglu_piped(x, gamma, w_in, w_out, chunks=2):
    m, d = x.shape
    inner = w_out.shape[0]
    tm = _row_tile(m, inner, n_bufs=2)
    xspec, gspec, winspec, woutspec = _specs(m, d, inner, tm)
    # y block must drop the leading grid dim to allow row-sliced stores
    yspec = pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_piped, inner=inner, chunks=chunks),
        grid=(m // tm,),
        in_specs=[xspec, gspec, winspec, woutspec],
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, gamma, w_in, w_out)


def geglu_variant(x, gamma, w_in, w_out, do_norm=True, do_gelu=True):
    m, d = x.shape
    inner = w_out.shape[0]
    tm = _row_tile(m, inner, n_bufs=2)
    xspec, gspec, winspec, woutspec = _specs(m, d, inner, tm)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_flags, inner=inner, do_norm=do_norm,
                          do_gelu=do_gelu),
        grid=(m // tm,),
        in_specs=[xspec, gspec, winspec, woutspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, gamma, w_in, w_out)


def bench_ffn():
    m, d, gi = 38400, 192, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    gamma = jnp.ones((1, d), jnp.bfloat16)
    w_in = jnp.asarray(rng.standard_normal((d, 2 * gi)) * 0.02, jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((gi, d)) * 0.02, jnp.bfloat16)

    gflop = (2.0 * m * d * 2 * gi + 2.0 * m * gi * d) / 1e9
    out = {"kernel": "geglu_ffn_fwd M=38400", "gflop": round(gflop, 2)}

    full = timed_chain(pallas_ffn.geglu_ffn, x, gamma, w_in, w_out)
    no_gelu = timed_chain(functools.partial(geglu_variant, do_gelu=False),
                          x, gamma, w_in, w_out)
    no_norm = timed_chain(functools.partial(geglu_variant, do_norm=False),
                          x, gamma, w_in, w_out)
    mm_only = timed_chain(functools.partial(
        geglu_variant, do_norm=False, do_gelu=False), x, gamma, w_in, w_out)

    # XLA bf16 dot chain of the same two matmuls (no fusion, no VPU)
    def dots(x, w_in, w_out):
        u = jnp.dot(x, w_in, preferred_element_type=jnp.float32)
        return jnp.dot(u.astype(x.dtype)[:, :gi], w_out,
                       preferred_element_type=jnp.float32).astype(x.dtype)

    xla_dots = timed_chain(dots, x, w_in, w_out)

    # dimension_semantics experiment: the fwd grid is pure row tiles (no
    # cross-program deps) — 'parallel' may let Mosaic double-buffer deeper
    def geglu_parallel(x, gamma, w_in, w_out):
        m, d = x.shape
        inner = w_out.shape[0]
        tm = _row_tile(m, inner, n_bufs=2)
        xspec, gspec, winspec, woutspec = _specs(m, d, inner, tm)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_flags, inner=inner, do_norm=True,
                              do_gelu=True),
            grid=(m // tm,),
            in_specs=[xspec, gspec, winspec, woutspec],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x, gamma, w_in, w_out)

    par = timed_chain(geglu_parallel, x, gamma, w_in, w_out)
    piped2 = timed_chain(functools.partial(geglu_piped, chunks=2),
                         x, gamma, w_in, w_out)
    piped4 = timed_chain(functools.partial(geglu_piped, chunks=4),
                         x, gamma, w_in, w_out)

    out.update({
        "parallel_semantics_ms": round(par, 3),
        "piped2_ms": round(piped2, 3), "piped4_ms": round(piped4, 3),
        "full_ms": round(full, 3), "no_gelu_ms": round(no_gelu, 3),
        "no_norm_ms": round(no_norm, 3), "matmuls_only_ms": round(mm_only, 3),
        "xla_dots_ms": round(xla_dots, 3),
        "gelu_cost_ms": round(full - no_gelu, 3),
        "norm_cost_ms": round(full - no_norm, 3),
        "full_tflops": round(gflop / full, 1),
        "matmul_only_tflops": round(gflop / mm_only, 1),
    })
    print(json.dumps(out), flush=True)
    return out


# --------------------------------------------------------------------------
# zorro attention: real kernel vs XLA matmul ceilings of the same shapes
# --------------------------------------------------------------------------


def bench_attn():
    b, n, heads, dh = 60, 640, 3, 64
    inner = heads * dh
    rng = np.random.default_rng(0)
    qkv0 = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.bfloat16)
    types = jnp.asarray(
        np.concatenate([np.zeros((b, 192)), np.ones((b, 192)),
                        np.full((b, 256), 2)], axis=1), jnp.int32)
    gflop = 4.0 * b * heads * n * n * dh / 1e9
    out = {"kernel": "zorro_attn_fwd b60 n640 h3 dh64",
           "gflop": round(gflop, 2)}

    def fwd_chain(qkv, types):
        o = pallas_attn.zorro_self_attention_packed_qkv(qkv, types, heads, 2)
        # chain the [b,n,inner] output back into the q lanes of the slab
        return jax.lax.dynamic_update_slice(qkv, o.astype(qkv.dtype),
                                            (0, 0, 0))

    def chain_overhead(qkv, types):
        return jax.lax.dynamic_update_slice(
            qkv, qkv[:, :, :inner] * jnp.bfloat16(1.0), (0, 0, 0))

    full = timed_chain(fwd_chain, qkv0, types)
    over = timed_chain(chain_overhead, qkv0, types)

    # XLA ceilings on [B*H, N, dh] batched matmuls (qk^T + av), chained
    q0 = jnp.asarray(rng.standard_normal((b * heads, n, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b * heads, n, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b * heads, n, dh)), jnp.bfloat16)

    def mm_chain(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.einsum("bnm,bmd->bnd", s, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def mm_softmax_chain(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bnm,bmd->bnd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    xla_mm = timed_chain(mm_chain, q0, k, v)
    xla_sm = timed_chain(mm_softmax_chain, q0, k, v)

    full_net = full - over
    out.update({
        "full_ms": round(full_net, 3), "chain_overhead_ms": round(over, 3),
        "xla_matmuls_only_ms": round(xla_mm, 3),
        "xla_matmuls_softmax_ms": round(xla_sm, 3),
        "softmax_cost_ms": round(xla_sm - xla_mm, 3),
        "full_tflops": round(gflop / full_net, 1),
        "xla_mm_tflops": round(gflop / xla_mm, 1),
    })
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all", choices=["all", "ffn", "attn"])
    args = ap.parse_args()
    if args.which in ("all", "ffn"):
        bench_ffn()
    if args.which in ("all", "attn"):
        bench_attn()


if __name__ == "__main__":
    main()
