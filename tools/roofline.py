"""Per-op roofline for the flagship pretrain step (round-4 verdict Do#1a).

Turns the "structurally bound by dh=64" paragraph into numbers: for each of
the top device ops in a jax.profiler trace of the bench step (same config as
bench.py: tiny 192d/12L, s1+s2, batch 60, bf16),

  * measured ms/step from the trace's device lanes,
  * FLOPs + minimum HBM bytes parsed from the COMPILED HLO — dot shapes
    inside each fusion computation, operand/result shapes for every op;
    Pallas custom-call FLOPs come from an analytic catalog (XLA counts
    custom-call FLOPs as zero),
  * arithmetic intensity, memory- vs compute-bound classification against
    the chip's ridge point, the attainable time bound
    max(flops/peak_flops, bytes/peak_bw), and achieved/attainable.

Output: ROOFLINE.json + a markdown table on stdout (pasted into PARITY.md).

v5e (v5litepod) peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (public TPU v5e
spec — the numbers jax-ml.github.io/scaling-book uses).

Usage:
    python tools/roofline.py [--steps 10] [--top 18] [--out ROOFLINE.json]
    python tools/roofline.py --trace /tmp/prof_step --parse_only
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import math
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_FLOPS = 197e12  # bf16
PEAK_BW = 819e9      # HBM bytes/s
RIDGE = PEAK_FLOPS / PEAK_BW  # ~240 flop/byte

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of one HLO shape string (possibly a tuple)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _shape_dims(shape_str: str):
    m = _SHAPE_RE.search(shape_str)
    if not m:
        return []
    return [int(d) for d in m.group(2).split(",") if d]


class HloModule:
    """Minimal HLO-text parser: per-instruction shapes, fusion->computation
    mapping, dot FLOP counting inside computations."""

    _INSTR_RE = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|[\w\[\],{}\/ ]+?)\s+"
        r"([\w\-]+)\((.*)$")

    def __init__(self, text: str):
        self.instr = {}          # name -> (shape_str, opcode, rest_of_line)
        self.computations = defaultdict(list)  # comp name -> [instr names]
        comp = None
        for line in text.splitlines():
            s = line.strip()
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->", s)
            if m and s.endswith("{"):
                comp = m.group(1)
                continue
            if s == "}":
                comp = None
                continue
            mi = self._INSTR_RE.match(line)
            if mi:
                name, shape, opcode, rest = mi.groups()
                self.instr[name] = (shape, opcode, rest)
                if comp:
                    self.computations[comp].append(name)

    def _operand_names(self, rest: str):
        return re.findall(r"%([\w.\-]+)", rest)

    def dot_flops(self, name: str) -> float:
        """2 * prod(out) * prod(contracting dims of lhs)."""
        shape, opcode, rest = self.instr[name]
        out = _shape_dims(shape)
        ops = self._operand_names(rest)
        mc = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", rest)
        if not ops or mc is None:
            return 0.0
        lhs_shape = _shape_dims(self.instr.get(ops[0], ("", "", ""))[0]) \
            if ops[0] in self.instr else []
        k = 1
        for ci in (int(c) for c in mc.group(1).split(",") if c):
            if ci < len(lhs_shape):
                k *= lhs_shape[ci]
        return 2.0 * math.prod(out or [0]) * k

    def conv_flops(self, name: str) -> float:
        shape, opcode, rest = self.instr[name]
        out = _shape_dims(shape)
        ops = self._operand_names(rest)
        if len(ops) < 2 or ops[1] not in self.instr:
            return 0.0
        kshape = _shape_dims(self.instr[ops[1]][0])
        # kernel spatial*in_ch contribute the contraction
        return 2.0 * math.prod(out or [0]) * math.prod(kshape[:-1] or [0])

    def flops_of(self, name: str) -> float:
        """FLOPs of an instruction; fusions recurse into their computation."""
        if name not in self.instr:
            return 0.0
        shape, opcode, rest = self.instr[name]
        if opcode == "fusion":
            mc = re.search(r"calls=%?([\w.\-]+)", rest)
            if not mc:
                return 0.0
            return sum(self.flops_of(n) for n in self.computations.get(
                mc.group(1), []))
        if opcode == "dot":
            return self.dot_flops(name)
        if opcode == "convolution":
            return self.conv_flops(name)
        return 0.0

    def bytes_of(self, name: str) -> int:
        """Minimum HBM traffic: every distinct operand read once + result
        written once (fusion semantics; an op that tiles well achieves it)."""
        if name not in self.instr:
            return 0
        shape, opcode, rest = self.instr[name]
        total = _shape_bytes(shape)
        seen = set()
        for op in self._operand_names(rest):
            if op in seen or op not in self.instr:
                continue
            seen.add(op)
            o_shape, o_opcode, _ = self.instr[op]
            if o_opcode in ("constant",):
                continue
            total += _shape_bytes(o_shape)
        return total


def pallas_flop_catalog(cfg):
    """Analytic FLOPs per custom-call kernel INVOCATION at the bench config
    (XLA reports 0 for tpu_custom_call). Patterns match the kernel names
    given to pl.pallas_call. Only matmul-ish FLOPs are counted (the MXU
    work the roofline cares about); VPU elementwise is excluded, consistent
    with how the XLA side is counted (dot/conv only)."""
    b = cfg.data.batch_size
    n_tok = cfg.data.num_patches * len(cfg.data.in_domains)
    e = cfg.mask.num_encoded_tokens
    f = cfg.model.num_fusion_tokens
    n = e + f                       # packed sequence
    h, dh = cfg.model.heads, cfg.model.dim_head
    d = cfg.model.dim_tokens
    inner = h * dh
    geglu_inner = int(d * cfg.model.ff_mult * 2 / 3)
    m = b * n

    attn_fwd = 4.0 * b * h * n * n * dh              # qk^T + av
    attn_bwd = 2.5 * attn_fwd                        # dq,dk,dv + recompute
    # fused GEGLU FFN: proj_in [M,d]x[d,2i] + proj_out [M,i]x[i,d]
    ffn_fwd = 2.0 * m * d * 2 * geglu_inner + 2.0 * m * geglu_inner * d
    ffn_bwd = 2.0 * ffn_fwd
    # fusion-row attention: per fusion slot, T-row attention over T=3 types
    t_rows = len(cfg.data.in_domains) + 1
    fus_attn_fwd = 4.0 * b * f * h * t_rows * t_rows * dh
    # fusion FFN (per-slot MLP on [B*F, d])
    mf = b * f
    fus_ffn_fwd = 2.0 * mf * d * 2 * geglu_inner + 2.0 * mf * geglu_inner * d
    return [
        (re.compile(r"zorro.*bwd|attn.*bwd", re.I), attn_bwd),
        (re.compile(r"zorro|packed_qkv|flash", re.I), attn_fwd),
        (re.compile(r"geglu.*bwd|ffn.*bwd|mlp.*bwd", re.I), ffn_bwd),
        (re.compile(r"geglu|mlp_ffn", re.I), ffn_fwd),
        (re.compile(r"fusion_row|fusion_attn", re.I), fus_attn_fwd),
        (re.compile(r"fus.*ffn", re.I), fus_ffn_fwd),
    ]


def capture(out_dir: str, n_steps: int):
    from profile_step import capture as cap

    cap(out_dir, n_steps)


def analyze(trace_dir: str, n_steps: int, top: int, out_path: str | None):
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
    step = jax.jit(pretrain.make_train_step(model, cfg, tx))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        np.random.default_rng(0), cfg.data.in_domains, cfg.data.batch_size,
        cfg.data.input_size).items()}
    hlo = HloModule(step.lower(state, batch).compile().as_text())

    # ---- aggregate trace device ops
    files = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace.json.gz under {trace_dir}"
    d = json.loads(gzip.open(sorted(files)[-1]).read())
    events = d["traceEvents"]
    names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, nm in names.items()
                if "TPU" in nm or "/device" in nm.lower() or "Device" in nm}
    if not dev_pids:
        dev_pids = {p for p, nm in names.items() if "XLA" in nm or "CPU" in nm}
    agg, cnt = defaultdict(float), defaultdict(int)
    total_us = 0.0
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev and ev.get("pid") in dev_pids:
            agg[ev["name"]] += ev["dur"]
            cnt[ev["name"]] += 1
            total_us += ev["dur"]

    catalog = pallas_flop_catalog(cfg)
    rows = []
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1]):
        ms_step = us / 1e3 / max(n_steps, 1)
        calls = cnt[name] // max(n_steps, 1)
        base = name.split("/")[-1]
        flops = hlo.flops_of(base) * calls
        bts = hlo.bytes_of(base) * calls
        kind = "xla"
        if base not in hlo.instr or "custom" in (
                hlo.instr.get(base, ("", "", ""))[1]):
            kind = "pallas" if any(p.search(name) for p, _ in catalog) \
                else "custom"
            for pat, fl in catalog:
                if pat.search(name):
                    flops = fl * calls
                    break
        t = ms_step / 1e3
        achieved_tf = flops / t / 1e12 if t > 0 else 0.0
        achieved_gb = bts / t / 1e9 if t > 0 else 0.0
        ai = flops / bts if bts else float("inf")
        bound_s = max(flops / PEAK_FLOPS, bts / PEAK_BW) if (flops or bts) \
            else 0.0
        rows.append({
            "op": name[:90], "kind": kind, "calls_per_step": calls,
            "ms_per_step": round(ms_step, 3),
            "gflops_per_step": round(flops / 1e9, 2),
            "mb_per_step": round(bts / 1e6, 2),
            "achieved_tflops": round(achieved_tf, 1),
            "achieved_gbs": round(achieved_gb, 1),
            "arith_intensity": round(ai, 1) if math.isfinite(ai) else None,
            "class": ("compute" if ai >= RIDGE else "memory")
                     if (flops or bts) else "unknown",
            "attainable_ms": round(bound_s * 1e3, 3),
            "pct_of_attainable": round(100 * bound_s * 1e3 / ms_step, 1)
                                  if ms_step > 0 and bound_s > 0 else None,
        })

    result = {
        "config": "bench flagship: 192d/12L/h3xdh64, s1+s2, batch 60, bf16",
        "peaks": {"tflops_bf16": PEAK_FLOPS / 1e12, "hbm_gbs": PEAK_BW / 1e9,
                  "ridge_flop_per_byte": round(RIDGE, 1)},
        "total_device_ms_per_step": round(total_us / 1e3 / max(n_steps, 1), 2),
        "ops": rows[:top],
        "residue_ms_per_step": round(
            sum(r["ms_per_step"] for r in rows[top:]), 3),
    }
    print(f"device total: {result['total_device_ms_per_step']} ms/step; "
          f"ridge {RIDGE:.0f} flop/byte")
    hdr = ("| op | ms/step | GFLOP | MB | TF/s | GB/s | AI | class | "
           "attainable ms | % of attainable |")
    print(hdr)
    print("|" + "---|" * 10)
    for r in result["ops"]:
        print(f"| {r['op'][:48]} | {r['ms_per_step']} | "
              f"{r['gflops_per_step']} | {r['mb_per_step']} | "
              f"{r['achieved_tflops']} | {r['achieved_gbs']} | "
              f"{r['arith_intensity']} | {r['class']} | "
              f"{r['attainable_ms']} | {r['pct_of_attainable']} |")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--trace", default="/tmp/prof_roofline")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.trace, args.steps)
    analyze(args.trace, args.steps, args.top, args.out)


if __name__ == "__main__":
    main()
