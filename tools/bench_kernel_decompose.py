"""Decompose the two hottest Pallas kernels' time into MXU vs VPU stages on
the real chip (round-5 roofline follow-up: the per-op table shows
zorro_attn_fwd/bwd and geglu_ffn_fwd/bwd at 33-56%% of their shape-aware
bounds; this tool measures WHERE the other half goes).

For the GEGLU FFN it times experimental kernel variants with VPU stages
stripped one at a time (LayerNorm -> identity, GELU -> identity, both) —
same shapes, same grid, same DMA pattern, so the deltas isolate the VPU
stages. For attention it times XLA bf16 batched-matmul ceilings of the same
shapes (qk^T + av with/without softmax) next to the real kernel.

Numbers go to stdout as JSON lines; paste the summary into PARITY.md.

Usage: python tools/bench_kernel_decompose.py [--reps 30]
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


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


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


def bench_ffn(reps):
    m, d, gi = 38400, 192, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    gamma = jnp.ones((1, d), jnp.bfloat16)
    w_in = jnp.asarray(rng.standard_normal((d, 2 * gi)) * 0.02, jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((gi, d)) * 0.02, jnp.bfloat16)

    gflop = (2.0 * m * d * 2 * gi + 2.0 * m * gi * d) / 1e9
    out = {"kernel": "geglu_ffn_fwd M=38400", "gflop": round(gflop, 2)}

    full = timeit(jax.jit(pallas_ffn.geglu_ffn), x, gamma, w_in, w_out,
                  reps=reps)
    no_gelu = timeit(jax.jit(functools.partial(geglu_variant, do_gelu=False)),
                     x, gamma, w_in, w_out, reps=reps)
    no_norm = timeit(jax.jit(functools.partial(geglu_variant, do_norm=False)),
                     x, gamma, w_in, w_out, reps=reps)
    mm_only = timeit(jax.jit(functools.partial(
        geglu_variant, do_norm=False, do_gelu=False)),
        x, gamma, w_in, w_out, reps=reps)

    # XLA bf16 dot ceiling for the same two matmuls (no fusion, no VPU)
    def dots(x, w_in, w_out):
        u = jnp.dot(x, w_in, preferred_element_type=jnp.float32)
        return jnp.dot(u.astype(x.dtype)[:, :gi], w_out,
                       preferred_element_type=jnp.float32).astype(x.dtype)

    xla_dots = timeit(jax.jit(dots), x, w_in, w_out, reps=reps)

    out.update({
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


def bench_attn(reps):
    b, n, heads, dh = 60, 640, 3, 64
    inner = heads * dh
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.bfloat16)
    types = jnp.asarray(
        np.concatenate([np.zeros((b, 192)), np.ones((b, 192)),
                        np.full((b, 256), 2)], axis=1), jnp.int32)
    gflop = 4.0 * b * heads * n * n * dh / 1e9
    out = {"kernel": "zorro_attn_fwd b60 n640 h3 dh64", "gflop": round(gflop, 2)}

    def fwd(qkv):
        return pallas_attn.zorro_self_attention_packed_qkv(qkv, types, heads, 2)

    full = timeit(jax.jit(fwd), qkv, reps=reps)

    # XLA ceilings on [B*H, N, dh] batched matmuls
    q = jnp.asarray(rng.standard_normal((b * heads, n, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b * heads, n, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b * heads, n, dh)), jnp.bfloat16)

    def mm_only(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.einsum("bnm,bmd->bnd", s, v,
                          preferred_element_type=jnp.float32)

    def mm_softmax(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bnm,bmd->bnd", p, v,
                          preferred_element_type=jnp.float32)

    xla_mm = timeit(jax.jit(mm_only), q, k, v, reps=reps)
    xla_sm = timeit(jax.jit(mm_softmax), q, k, v, reps=reps)

    # dh=128 ceiling at same total flops: h=3->fold pairs? use [B*H, N, 128]
    q2 = jnp.asarray(rng.standard_normal((b * heads // 1, n, 128)), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((b * heads // 1, n, 128)), jnp.bfloat16)

    def mm_dh128(q, k):
        return jnp.einsum("bnd,bmd->bnm", q, k,
                          preferred_element_type=jnp.float32)

    xla_dh128_qk = timeit(jax.jit(mm_dh128), q2, k2, reps=reps)

    def mm_dh64_qk(q, k):
        return jnp.einsum("bnd,bmd->bnm", q, k,
                          preferred_element_type=jnp.float32)

    xla_dh64_qk = timeit(jax.jit(mm_dh64_qk), q, k, reps=reps)

    out.update({
        "full_ms": round(full, 3),
        "xla_matmuls_only_ms": round(xla_mm, 3),
        "xla_matmuls_softmax_ms": round(xla_sm, 3),
        "softmax_cost_ms": round(xla_sm - xla_mm, 3),
        "full_tflops": round(gflop / full, 1),
        "xla_mm_tflops": round(gflop / xla_mm, 1),
        "qk_dh64_ms": round(xla_dh64_qk, 3),
        "qk_dh128_same_bh_ms": round(xla_dh128_qk, 3),
        "qk_dh128_vs_dh64_flop_ratio": 2.0,
    })
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--which", default="all", choices=["all", "ffn", "attn"])
    args = ap.parse_args()
    if args.which in ("all", "ffn"):
        bench_ffn(args.reps)
    if args.which in ("all", "attn"):
        bench_attn(args.reps)


if __name__ == "__main__":
    main()
