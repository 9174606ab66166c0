"""KV-grid assembly for the per-layer fusion blocks: asymmetric custom VJP.

The flagship's fusion block scatters the packed visible tokens' KV rows
into the [B, T*F, 2i] modality grid every layer (reference
multimae_crossattn.py:454-460 does it with in-place fancy indexing). The
round-1 TPU design replaced that scatter with a one-hot MXU matmul
(models/multimae._grid_onehot) — great for the BACKWARD (the transpose of
a matmul is a matmul, where the transpose of a gather is a TPU-hostile
scatter-add), but the FORWARD pays ~9 GFLOP/layer of matmul against
mostly-zero operands (~6.5% of the whole step's FLOPs across 12 layers,
the round-3 profile's named "KV-assembly" residue).

This op takes the cheap half of each world:

  forward:  row gather (take_along_axis) — pure HBM traffic, no FLOPs
  backward: dkv = onehot^T-matmul, with the one-hot rebuilt in-VJP from
            the integer slots (a [B,G,E] compare+select, ~0.03 ms) so the
            forward needs no one-hot materialization at all

Bit-identical to the one-hot matmul path both directions: the forward
matmul summed exactly one product (value * 1.0 in f32, cast back), which
is what the gather returns; the backward IS the same matmul
(tests/test_assemble.py).

MEASURED AND REJECTED as the default (v5e-1, flagship s1+s2 bench config,
same session back-to-back): gather 62.64 ms/step vs one-hot 58.49 —
XLA lowers the [60, 512]-row take_along_axis over [60, 384, 384] to a
dynamic-gather that loses to the MXU matmul it was meant to replace,
the round-1 design call confirmed at op granularity. Kept behind
``ModelConfig.kv_assembly='gather'`` for future shapes where E is large
enough that the one-hot FLOPs dominate the gather's latency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def grid_assemble(kv_p: jnp.ndarray, slot: jnp.ndarray, use: jnp.ndarray):
    """kv_p [B, E, C]; slot [B, G] int (ids_restore); use [B, G] bool.

    Returns [B, G, C]: row g = kv_p[b, slot[b, g]] where ``use``, else 0 —
    exactly ``onehot @ kv_p`` for onehot = (slot == arange(E)) & use.
    """
    e = kv_p.shape[1]
    g = jnp.take_along_axis(
        kv_p, jnp.clip(slot, 0, e - 1)[..., None], axis=1)
    return jnp.where(use[..., None], g, 0)


def _fwd(kv_p, slot, use):
    return grid_assemble(kv_p, slot, use), (slot, use, kv_p.shape[1])


def _bwd(res, dg):
    slot, use, e = res
    onehot = (
        (slot[..., None] == jnp.arange(e, dtype=slot.dtype)) & use[..., None]
    ).astype(dg.dtype)
    dkv = jnp.einsum(
        "bge,bgc->bec", onehot, dg, preferred_element_type=jnp.float32
    ).astype(dg.dtype)
    return dkv, None, None


grid_assemble.defvjp(_fwd, _bwd)
