"""Pallas TPU kernel: fused GEGLU feed-forward (forward + custom VJP).

The encoder/fusion-block FF (reference zorro_utils.py:115-128:
LayerNorm -> Dense(2*inner, no bias) -> GEGLU -> Dense(dim, no bias)) is the
step's single largest XLA cost after attention: the [M, 2*inner] activation
round-trips HBM twice per layer and three more times in the backward. This
kernel keeps the whole FF in VMEM per row tile — HBM traffic drops to the
x/dy/dx slabs plus one weight read — with the internal bias-less LayerNorm
fused in.

Forward per tile (TM rows):
    z  = (x - mean) * rsqrt(var + eps)        # f32
    xn = (z * gamma).astype(bf16)
    u  = xn @ w_in                            # [TM, 2I], f32 accum
    a  = val * gelu_exact(gate)               # u split as [val | gate]
    y  = a.astype(bf16) @ w_out               # [TM, D]

Backward recomputes the forward per tile (flash-style) and accumulates the
weight/gamma grads in f32 VMEM scratch across the sequential row-tile grid.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import interpret_mode


def _par(ndims: int):
    """'parallel' dimension semantics for dependency-free grids (forward
    row tiles) — Mosaic double-buffers deeper; measured 16% faster on the
    GEGLU fwd (round 5, tools/bench_kernel_decompose.py). The backwards
    accumulate weight grads in scratch across the grid and MUST stay
    'arbitrary'."""
    return pltpu.CompilerParams(dimension_semantics=("parallel",) * ndims)

LN_EPS = 1e-5
_SQRT_2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _row_tile(m: int, inner: int = 512, n_bufs: int = 3) -> int:
    """Largest MXU-aligned row tile dividing m whose f32 working set
    (~n_bufs [TM, 2I] activation buffers) stays within VMEM budget.
    Forward needs ~1.5 buffers (u + gelu product); backward ~3 (u, du,
    da/dx temporaries) — so the forward gets a looser VMEM budget and can
    run more rows per program (768 divides both 60*640 and 60*256)."""
    budget = 8e6 if n_bufs >= 3 else 13e6
    if os.environ.get("FFN_FWD_NBUFS"):  # experiment override (bench A/B)
        n_bufs = max(n_bufs, int(os.environ["FFN_FWD_NBUFS"]))
        budget = 8e6 if n_bufs >= 3 else 13e6
    for tm in (2048, 1024, 768, 512, 256, 128):
        if m % tm == 0 and m // tm >= 2 and tm * 2 * inner * 4 * n_bufs <= budget:
            return tm
    return 0


def _norm_fwd(x, gamma):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    z = (xf - mean) * rstd
    return z, rstd, (z * gamma.astype(jnp.float32))


_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 0.000023547966471313185,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)


def _erf(x):
    """erf for the TPU kernel body — ``lax.erf`` has no Pallas TPU lowering.
    This is XLA's own f32 rational approximation (math.cc ErfImpl32:
    clamp(x*P(x^2)/Q(x^2))), so the kernel matches the XLA fallback path to
    float ulps without exp/divide-heavy erfc fits."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + c
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + c
    return jnp.clip(x * p / q, -1.0, 1.0)


def _gelu_parts(g, erf_fn=_erf):
    """exact-erf GELU value and derivative (matches jax.nn.gelu
    approximate=False, the torch F.gelu default)."""
    cdf = 0.5 * (1.0 + erf_fn(g / _SQRT_2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * g * g)
    return g * cdf, cdf + g * pdf


def _fwd_kernel(x_ref, gamma_ref, win_ref, wout_ref, y_ref, *, inner):
    x = x_ref[...]
    _, _, xn = _norm_fwd(x, gamma_ref[...])
    u = jnp.dot(xn.astype(x.dtype), win_ref[...],
                preferred_element_type=jnp.float32)  # [TM, 2I]
    val = u[:, :inner]
    gate = u[:, inner:]
    gv, _ = _gelu_parts(gate)
    a = val * gv
    y_ref[...] = jnp.dot(a.astype(x.dtype), wout_ref[...],
                         preferred_element_type=jnp.float32).astype(y_ref.dtype)


def _bwd_kernel(x_ref, gamma_ref, win_ref, wout_ref, dy_ref,
                dx_ref, dgamma_ref, dwin_ref, dwout_ref,
                dgamma_acc, dwin_acc, dwout_acc, *, inner):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    x = x_ref[...]
    gamma = gamma_ref[...].astype(jnp.float32)
    z, rstd, xn_f = _norm_fwd(x, gamma_ref[...])
    xn = xn_f.astype(x.dtype)
    u = jnp.dot(xn, win_ref[...], preferred_element_type=jnp.float32)
    val = u[:, :inner]
    gate = u[:, inner:]
    gv, gd = _gelu_parts(gate)
    a = val * gv
    dy = dy_ref[...].astype(jnp.float32)

    # y = a @ w_out
    dwout_t = jax.lax.dot_general(
        a.astype(x.dtype), dy_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [I, D]
    da = jax.lax.dot_general(
        dy_ref[...], wout_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TM, I]
    dval = da * gv
    dgate = da * val * gd
    du = jnp.concatenate([dval, dgate], axis=-1).astype(x.dtype)  # [TM, 2I]
    dwin_t = jax.lax.dot_general(
        xn, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [D, 2I]
    dxn = jax.lax.dot_general(
        du, win_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TM, D]

    # LayerNorm backward (bias-less: gamma only)
    dgamma_t = jnp.sum(dxn * z, axis=0)  # [D]
    dz = dxn * gamma
    d = x.shape[-1]
    dx = (dz - jnp.mean(dz, axis=-1, keepdims=True)
          - z * jnp.mean(dz * z, axis=-1, keepdims=True)) * rstd
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dgamma_acc[...] = dgamma_t[None]
        dwin_acc[...] = dwin_t
        dwout_acc[...] = dwout_t

    @pl.when(i > 0)
    def _():
        dgamma_acc[...] += dgamma_t[None]
        dwin_acc[...] += dwin_t
        dwout_acc[...] += dwout_t

    @pl.when(i == nprog - 1)
    def _():
        dgamma_ref[...] = dgamma_acc[...].astype(dgamma_ref.dtype)
        dwin_ref[...] = dwin_acc[...].astype(dwin_ref.dtype)
        dwout_ref[...] = dwout_acc[...].astype(dwout_ref.dtype)


def _specs(m: int, d: int, inner: int, tm: int):
    xspec = pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    winspec = pl.BlockSpec((d, 2 * inner), lambda i: (0, 0), memory_space=pltpu.VMEM)
    woutspec = pl.BlockSpec((inner, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return xspec, gspec, winspec, woutspec


@jax.custom_vjp
def geglu_ffn(x, gamma, w_in, w_out):
    """Fused LayerNorm+GEGLU FF. x: [M, D]; gamma: [1, D]; w_in: [D, 2I];
    w_out: [I, D]. Requires a row tile dividing M (see _row_tile)."""
    return _ffn_fwd_impl(x, gamma, w_in, w_out)


def _ffn_fwd_impl(x, gamma, w_in, w_out):
    m, d = x.shape
    inner = w_out.shape[0]
    tm = _row_tile(m, inner, n_bufs=2)
    interpret = interpret_mode()
    xspec, gspec, winspec, woutspec = _specs(m, d, inner, tm)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, inner=inner),
        grid=(m // tm,),
        compiler_params=_par(1),
        in_specs=[xspec, gspec, winspec, woutspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, gamma, w_in, w_out)


def _ffn_fwd(x, gamma, w_in, w_out):
    return _ffn_fwd_impl(x, gamma, w_in, w_out), (x, gamma, w_in, w_out)


def _ffn_bwd(res, dy):
    x, gamma, w_in, w_out = res
    m, d = x.shape
    inner = w_out.shape[0]
    tm = _row_tile(m, inner)
    interpret = interpret_mode()
    xspec, gspec, winspec, woutspec = _specs(m, d, inner, tm)
    dx, dgamma, dwin, dwout = pl.pallas_call(
        functools.partial(_bwd_kernel, inner=inner),
        grid=(m // tm,),
        in_specs=[xspec, gspec, winspec, woutspec, xspec],
        out_specs=(xspec, gspec, winspec, woutspec),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(gamma.shape, gamma.dtype),
            jax.ShapeDtypeStruct(w_in.shape, w_in.dtype),
            jax.ShapeDtypeStruct(w_out.shape, w_out.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((d, 2 * inner), jnp.float32),
            pltpu.VMEM((inner, d), jnp.float32),
        ],
        interpret=interpret,
    )(x, gamma, w_in, w_out, dy)
    return dx, dgamma, dwin, dwout


geglu_ffn.defvjp(_ffn_fwd, _ffn_bwd)


VMEM_SCOPE = 14e6  # conservative slice of the 16 MB/core scoped limit


def ffn_supported(m: int, d: int, inner: int, itemsize: int = 2) -> bool:
    """Row tiling must divide M, AND the whole working set must fit the
    VMEM scope: resident weights (itemsize-dependent — the f32 init trace
    routes here too), the backward's f32 weight/gamma-grad accumulators
    (d*2I + I*d + d floats, held across the entire row-tile grid), and the
    tile buffers. At d=768 (base-class geometry) the accumulators alone are
    ~19 MB, so the kernel correctly declines and the XLA fallback serves —
    discovered via a Mosaic scoped-vmem OOM when base_tpu first compiled."""
    if os.environ.get("IMF_DISABLE_PALLAS_FFN"):  # ablation A/B (bench)
        return False
    tm = _row_tile(m, inner)
    if tm <= 0:
        return False
    weights = (d * 2 * inner + inner * d + d) * itemsize
    bwd_accums = (d * 2 * inner + inner * d + d) * 4
    tile = tm * 2 * inner * 4 * 3  # bwd transients (u, du, da)
    return weights + bwd_accums + tile <= VMEM_SCOPE


def geglu_ffn_xla(x, gamma, w_in, w_out):
    """Pure-XLA reference with identical numerics (norm f32, matmuls in the
    activation dtype, exact-erf GELU) — the fallback and the parity target."""
    inner = w_out.shape[0]
    _, _, xn = _norm_fwd(x, gamma)
    u = jnp.dot(xn.astype(x.dtype), w_in, preferred_element_type=jnp.float32)
    val, gate = u[:, :inner], u[:, inner:]
    gv, _ = _gelu_parts(gate, erf_fn=jax.lax.erf)
    a = (val * gv).astype(x.dtype)
    return jnp.dot(a, w_out, preferred_element_type=jnp.float32).astype(x.dtype)


def geglu_ffn_auto(x, gamma, w_in, w_out):
    """Platform-resolved fused FF: Pallas when lowered for TPU, XLA
    elsewhere (same rationale as pallas_attn.zorro_self_attention_auto)."""
    return jax.lax.platform_dependent(
        x, gamma, w_in, w_out, tpu=geglu_ffn, default=geglu_ffn_xla
    )


# ---------------------------------------------------------------------------
# Plain MLP (fc1 -> exact GELU -> fc2, with biases) — the reconstruction
# decoder's ViT blocks (multimae_utils.py:138-155 Mlp). No internal norm.
# ---------------------------------------------------------------------------


def _mlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[...]
    a, _ = _gelu_parts(h)
    y = jnp.dot(a.astype(x.dtype), w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def _mlp_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, dy_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dw1_acc, db1_acc, dw2_acc, db2_acc):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[...]
    a, gd = _gelu_parts(h)
    dy = dy_ref[...].astype(jnp.float32)

    dw2_t = jax.lax.dot_general(
        a.astype(x.dtype), dy_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_t = jnp.sum(dy, axis=0, keepdims=True)
    da = jax.lax.dot_general(
        dy_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = (da * gd).astype(x.dtype)
    dw1_t = jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db1_t = jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_acc[...] = dw1_t
        db1_acc[...] = db1_t
        dw2_acc[...] = dw2_t
        db2_acc[...] = db2_t

    @pl.when(i > 0)
    def _():
        dw1_acc[...] += dw1_t
        db1_acc[...] += db1_t
        dw2_acc[...] += dw2_t
        db2_acc[...] += db2_t

    @pl.when(i == nprog - 1)
    def _():
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)
        dw2_ref[...] = dw2_acc[...].astype(dw2_ref.dtype)
        db2_ref[...] = db2_acc[...].astype(db2_ref.dtype)


def _mlp_specs(d: int, hidden: int, out: int, tm: int):
    xspec = pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w1spec = pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b1spec = pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((hidden, out), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b2spec = pl.BlockSpec((1, out), lambda i: (0, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((tm, out), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return xspec, w1spec, b1spec, w2spec, b2spec, yspec


@jax.custom_vjp
def mlp_ffn(x, w1, b1, w2, b2):
    """Fused fc1->GELU(exact)->fc2. x: [M, D]; w1: [D, H]; b1: [1, H];
    w2: [H, O]; b2: [1, O]."""
    return _mlp_fwd_impl(x, w1, b1, w2, b2)


def _mlp_fwd_impl(x, w1, b1, w2, b2):
    m, d = x.shape
    hidden = w1.shape[1]
    out = w2.shape[1]
    tm = _row_tile(m, hidden // 2, n_bufs=2)
    interpret = interpret_mode()
    xspec, w1s, b1s, w2s, b2s, yspec = _mlp_specs(d, hidden, out, tm)
    return pl.pallas_call(
        _mlp_fwd_kernel,
        grid=(m // tm,),
        compiler_params=_par(1),
        in_specs=[xspec, w1s, b1s, w2s, b2s],
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((m, out), x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _mlp_fwd(x, w1, b1, w2, b2):
    return _mlp_fwd_impl(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _mlp_bwd(res, dy):
    x, w1, b1, w2, b2 = res
    m, d = x.shape
    hidden = w1.shape[1]
    out = w2.shape[1]
    tm = _row_tile(m, hidden // 2)
    interpret = interpret_mode()
    xspec, w1s, b1s, w2s, b2s, yspec = _mlp_specs(d, hidden, out, tm)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(m // tm,),
        in_specs=[xspec, w1s, b1s, w2s, b2s, yspec],
        out_specs=(xspec, w1s, b1s, w2s, b2s),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(w1.shape, w1.dtype),
            jax.ShapeDtypeStruct(b1.shape, b1.dtype),
            jax.ShapeDtypeStruct(w2.shape, w2.dtype),
            jax.ShapeDtypeStruct(b2.shape, b2.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, hidden), jnp.float32),
            pltpu.VMEM((1, hidden), jnp.float32),
            pltpu.VMEM((hidden, out), jnp.float32),
            pltpu.VMEM((1, out), jnp.float32),
        ],
        interpret=interpret,
    )(x, w1, b1, w2, b2, dy)
    return dx, dw1, db1, dw2, db2


mlp_ffn.defvjp(_mlp_fwd, _mlp_bwd)


def mlp_ffn_xla(x, w1, b1, w2, b2):
    """Pure-XLA reference / fallback with identical numerics."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    a, _ = _gelu_parts(h, erf_fn=jax.lax.erf)
    return (jnp.dot(a.astype(x.dtype), w2, preferred_element_type=jnp.float32)
            + b2).astype(x.dtype)


def mlp_ffn_auto(x, w1, b1, w2, b2):
    return jax.lax.platform_dependent(
        x, w1, b1, w2, b2, tpu=mlp_ffn, default=mlp_ffn_xla
    )


def mlp_supported(m: int, hidden: int, d: int = 0, itemsize: int = 2) -> bool:
    if os.environ.get("IMF_DISABLE_PALLAS_FFN"):  # ablation A/B (bench)
        return False
    tm = _row_tile(m, hidden // 2)
    if tm <= 0:
        return False
    if d:  # same VMEM-scope model as ffn_supported (weights + f32 accums)
        weights = (d * hidden + hidden * d + hidden + d) * itemsize
        bwd_accums = (d * hidden + hidden * d + hidden + d) * 4
        tile = tm * hidden * 4 * 3
        return weights + bwd_accums + tile <= VMEM_SCOPE
    return True
