"""Capture a jax.profiler trace of the bench pretrain step and print the
top HLO ops by self time (profile-guided perf work, PARITY.md performance
record). Replaces eyeballing the TensorBoard UI: parses the xplane with
tensorboard_plugin_profile's op_profile converter.

Usage:
    python tools/profile_step.py [--steps 10] [--top 40] [--out /tmp/prof]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from incomplete_multimodal_fusion_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()


def capture(out_dir: str, n_steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig,
    )
    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
    from incomplete_multimodal_fusion_tpu.train import pretrain

    cfg = PretrainConfig(
        data=DataConfig(input_size=256, patch_size=16,
                        in_domains=("s1", "s2"), out_domains=("s1", "s2"),
                        batch_size=60),
        mask=MaskConfig(num_encoded_tokens=384),
    )
    model, state, tx = pretrain.create_train_state(
        cfg, jax.random.PRNGKey(0), total_steps=1000)
    step = jax.jit(pretrain.make_train_step(model, cfg, tx), donate_argnums=0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        np.random.default_rng(0), cfg.data.in_domains, cfg.data.batch_size,
        cfg.data.input_size).items()}
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # hard sync through the tunnel

    jax.profiler.start_trace(out_dir)
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    jax.profiler.stop_trace()


def report(out_dir: str, top: int, n_steps: int):
    """Aggregate the Chrome-format trace (vm.trace.json.gz) by op name on
    the device lanes (the tensorboard_plugin_profile converter is broken in
    this environment — TF version mismatch)."""
    import gzip
    from collections import defaultdict

    files = glob.glob(os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace.json.gz under {out_dir}"
    d = json.loads(gzip.open(sorted(files)[-1]).read())
    events = d["traceEvents"]
    # device lanes: pids whose process_name metadata mentions TPU/device
    names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    if not dev_pids:  # CPU-backend traces label lanes differently
        dev_pids = {p for p, n in names.items() if "XLA" in n or "CPU" in n}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev and ev.get("pid") in dev_pids:
            agg[ev["name"]] += ev["dur"]
            cnt[ev["name"]] += 1
            total += ev["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"device lanes: {[names[p] for p in dev_pids]}")
    print(f"total device-op time: {total/1e3:.2f} ms over {n_steps} steps "
          f"({total/1e3/max(n_steps,1):.2f} ms/step)")
    print(f"top {top} ops by device time:")
    for name, us in rows[:top]:
        print(f"  {us/1e3/max(n_steps,1):7.3f} ms/step  x{cnt[name]//max(n_steps,1):<4d} {name[:100]}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="/tmp/prof_step")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.out, args.steps)
    report(args.out, args.top, args.steps)


if __name__ == "__main__":
    main()
