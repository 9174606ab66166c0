"""Break the batch-1 infer tile latency (bench.py bench_infer_latency,
round-2 verdict Weak #2) into its parts:

  null_rtt_ms      p50 of dispatch+fetch for a trivial jitted op — the
                   tunnel round-trip + dispatch floor; no model compute.
  chained_ms       per-forward device time when 8 dependent forwards run
                   back-to-back with ONE final fetch — amortizes the host
                   round-trip away, leaving dispatch+compute.
  single_ms        the bench's own measurement (one forward, one fetch).

single - chained ~= host round-trip paid per call; chained - compute is
dispatch pipelining. Writes INFER_LATENCY_BREAKDOWN.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from incomplete_multimodal_fusion_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    from incomplete_multimodal_fusion_tpu.config import PretrainConfig
    from incomplete_multimodal_fusion_tpu.models.multimae import build_multimae
    from incomplete_multimodal_fusion_tpu.ops import masking
    from incomplete_multimodal_fusion_tpu.train import pretrain

    cfg = PretrainConfig()
    model = build_multimae(cfg)
    params = pretrain.cast_tree(
        pretrain.init_model(model, cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    doms = tuple(cfg.data.in_domains)
    n = cfg.data.num_patches
    e = 256
    x = {d: jnp.zeros((1, 256, 256, {"s1": 1, "s2": 3, "dem": 1}[d]),
                      jnp.bfloat16) for d in doms}
    mi = masking.generate_random_masks(
        jax.random.PRNGKey(1), doms, (n,) * len(doms), e, 1)

    @jax.jit
    def fwd(params, x, mi):
        out = model.apply({"params": params}, x, mi, e)
        return out["preds"]

    @jax.jit
    def null(a):
        return a + 1.0

    @jax.jit
    def fwd_chain(params, x, mi, k=8):
        xc = x
        s = jnp.zeros((), jnp.float32)
        for _ in range(k):
            preds = model.apply({"params": params}, xc, mi, e)["preds"]
            # feed the prediction back in so the chain is dependent and
            # XLA cannot elide any iteration
            xc = {d: (xc[d] + preds[d].astype(xc[d].dtype) * 1e-6) for d in doms}
            s = s + preds[doms[0]].sum().astype(jnp.float32)
        return s

    # warm everything
    float(null(jnp.zeros(())))
    preds = fwd(params, x, mi)
    float(preds[doms[0]].sum())
    float(fwd_chain(params, x, mi))

    def p50(fn, reps=30):
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            lat.append(time.perf_counter() - t0)
        return float(np.percentile(lat, 50) * 1e3)

    null_ms = p50(lambda: float(null(jnp.zeros(()))))
    single_ms = p50(lambda: float(fwd(params, x, mi)[doms[0]].sum()))
    chain_total = p50(lambda: float(fwd_chain(params, x, mi)))
    chained_ms = (chain_total - null_ms) / 8.0

    out = {
        "null_rtt_ms": round(null_ms, 2),
        "single_fwd_ms": round(single_ms, 2),
        "chained_fwd_ms_per_call": round(chained_ms, 2),
        "host_roundtrip_share_ms": round(single_ms - chained_ms, 2),
        "note": "single - chained = per-call host round-trip + dispatch "
                "through the axon tunnel; chained = on-device compute",
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "INFER_LATENCY_BREAKDOWN.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
