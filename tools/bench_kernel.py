"""Micro-benchmark a single Pallas kernel at the flagship shape on the real
chip (kernel-level A/B for ops/pallas_attn.py work — full-step A/Bs go
through tools/bench_ablate.py).

Usage: python tools/bench_kernel.py <which>
  which: attn_fwd | attn_fwdbwd | small_fwd | small_fwdbwd
         | fusrow_fwd | fusrow_fwdbwd
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incomplete_multimodal_fusion_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main(which: str):
    from incomplete_multimodal_fusion_tpu.ops import pallas_attn

    rng = np.random.default_rng(0)
    if which.startswith("attn"):
        b, n, heads, dh = 60, 640, 3, 64
        inner = heads * dh
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.bfloat16)
        types = jnp.asarray(
            np.concatenate([np.zeros((b, 192)), np.ones((b, 192)),
                            np.full((b, 256), 2)], axis=1), jnp.int32)

        def fwd(qkv):
            return pallas_attn.zorro_self_attention_packed_qkv(
                qkv, types, heads, 2)

        if which == "attn_fwd":
            f = jax.jit(fwd)
            print(f"attn_fwd: {timeit(f, qkv):.3f} ms")
        else:
            def loss(qkv):
                return jnp.sum(fwd(qkv).astype(jnp.float32))
            f = jax.jit(jax.grad(loss))
            print(f"attn_fwdbwd: {timeit(f, qkv):.3f} ms")
    elif which.startswith("small"):
        from incomplete_multimodal_fusion_tpu.ops import pallas_small_attn
        b, n, heads, dh = 60, 256, 8, 32
        inner = heads * dh
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.bfloat16)

        def fwd(qkv):
            return pallas_small_attn.small_attention_qkv(qkv, heads, dh)

        if which == "small_fwd":
            f = jax.jit(fwd)
            print(f"small_fwd: {timeit(f, qkv):.3f} ms")
        else:
            def loss(qkv):
                return jnp.sum(fwd(qkv).astype(jnp.float32))
            f = jax.jit(jax.grad(loss))
            print(f"small_fwdbwd: {timeit(f, qkv):.3f} ms")
    else:
        raise SystemExit(f"unknown kernel {which}")


if __name__ == "__main__":
    main(sys.argv[1])
