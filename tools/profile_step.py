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


def walk(node, depth=0, rows=None):
    rows = rows if rows is not None else []
    m = node.get("metrics", {})
    rows.append((m.get("time", 0.0), node.get("name", "?"), depth,
                 m.get("flops", 0.0), m.get("bandwidthUtils", [])))
    for c in node.get("children", []):
        walk(c, depth + 1, rows)
    return rows


def report(out_dir: str, top: int, n_steps: int):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    files = glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb"))
    assert files, f"no xplane under {out_dir}"
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    root = d.get("byProgram") or d.get("byCategory")
    rows = walk(root)
    # leaf ops only (no children) sorted by time fraction
    leaves = [r for r in rows if r[2] >= 2]
    leaves.sort(reverse=True)
    total = root.get("metrics", {}).get("time", 1.0)
    print(f"top {top} ops by time share (of device total; {n_steps} steps):")
    for t, name, depth, flops, bw in leaves[:top]:
        print(f"  {t*100:6.2f}%  {name[:110]}")
    return d


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
