"""Per-op roofline for the flagship pretrain step (round-4 verdict Do#1a).

Turns the "structurally bound by dh=64" paragraph into numbers. The
jax.profiler trace's "XLA Ops" device lane carries, per executed HLO op,
the measured device time plus XLA's own accounting:

  * ``model_flops``    — dot/conv FLOPs of the op (0 for custom calls),
  * ``raw_bytes_accessed`` — HBM bytes the op actually moved,
  * ``long_name``      — the full HLO instruction with operand shapes.

Pallas kernels all surface as ``tpu_custom_call`` with zero flops/bytes, so
they are identified by their operand-shape signature against the bench
config's known kernel set and assigned analytic MXU FLOPs; their minimum
HBM bytes are the operand+result shapes parsed from ``long_name`` (each
read/written exactly once — what a well-tiled kernel achieves).

Per op (grouped across the 12 layers by signature): achieved TF/s and GB/s,
arithmetic intensity, memory- vs compute-bound against the ridge point, the
attainable time bound max(flops/peak_flops, bytes/peak_bw), and
achieved/attainable. Summing the attainable bound over EVERY device op
(not just the top table) gives a quantified floor for the whole step.

Output: ROOFLINE.json + a markdown table on stdout (pasted into PARITY.md).

v5e (v5litepod) peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (public TPU v5e
spec — the numbers jax-ml.github.io/scaling-book uses).

Usage:
    python tools/roofline.py [--steps 10] [--top 20] [--out ROOFLINE.json]
    python tools/roofline.py --trace /tmp/prof_roofline --parse_only
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

from incomplete_multimodal_fusion_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()

PEAK_FLOPS = 197e12  # bf16
PEAK_BW = 819e9      # HBM bytes/s
RIDGE = PEAK_FLOPS / PEAK_BW  # ~240 flop/byte

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}

_SHAPE_RE = re.compile(r"(pred|bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|s64|u64)"
                       r"\[([\d,]*)\]")


def _shapes_in(text: str):
    """All (dtype, dims) shapes appearing in an HLO long_name."""
    out = []
    for dt, dims in _SHAPE_RE.findall(text):
        out.append((dt, tuple(int(d) for d in dims.split(",") if d)))
    return out


def _shape_bytes(shapes) -> int:
    return sum(_DTYPE_BYTES[dt] * math.prod(dims or (1,))
               for dt, dims in shapes)


class KernelCatalog:
    """Identify Pallas custom calls by EXACT operand-shape signature at the
    given config and assign analytic MXU FLOPs (VPU elementwise excluded —
    only dot-like work, consistent with XLA's model_flops). FLOP factors
    come from counting the dots in each kernel's source:

      * packed-qkv zorro attention fwd = qk^T + av = 4·b·h·n²·dh;
        bwd = recompute sim + dv + dP + dq + dk = 2.5x fwd
        (ops/pallas_attn.py _bwd_kernel_packed_qkv)
      * GEGLU FFN fwd = [M,d]x[d,2gi] + [M,gi]x[gi,d] = 6·M·d·gi;
        bwd = recompute u + dwout + da + dwin + dxn = 16·M·d·gi = 8/3 x fwd
        (ops/pallas_ffn.py _bwd_kernel lines 116-138)
      * decoder MLP fwd = 2·M·d·4d·2 = 16·M·d²; bwd = 2.5x
        (ops/pallas_ffn.py mlp _bwd 284-299: recompute h + dw2 + da + dw1 + dx)
      * decoder small-N attention fwd = 4·b·n²·inner; bwd 2.5x
      * fusion-row slot attention: sim+mix over t per-slot rows =
        4·b·f·h·t·dh (memory-bound; flops negligible)
    """

    def __init__(self, cfg):
        b = cfg.data.batch_size
        e = cfg.mask.num_encoded_tokens
        f = cfg.model.num_fusion_tokens
        n = e + f                              # packed encoder sequence
        h, dh = cfg.model.heads, cfg.model.dim_head
        d = cfg.model.dim_tokens
        i = h * dh
        gi = int(d * cfg.model.ff_mult * 2 / 3)   # GEGLU inner
        t = len(cfg.data.in_domains)               # modality types
        dd = cfg.decoder.dim                       # decoder width
        nd = cfg.data.num_patches                  # decoder sequence
        m_enc, m_fus, m_dec = b * n, b * f, b * nd

        attn_fwd = 4.0 * b * h * n * n * dh
        geglu = lambda m: 6.0 * m * d * gi  # noqa: E731
        dec_attn_fwd = 4.0 * b * nd * nd * dd
        dec_mlp_fwd = 16.0 * m_dec * dd * dd
        fus_row_fwd = 4.0 * b * f * h * t * dh

        bf, s32 = "bf16", "s32"
        self.sig = {}

        def add(res, ops, label, flops):
            self.sig[((bf, res), tuple(sorted(ops)))] = (label, flops)

        types = (s32, (b, 1, n))
        x_enc, w_in, w_out, bias = (bf, (m_enc, d)), (bf, (d, 2 * gi)), \
            (bf, (gi, d)), (bf, (1, d))
        x_fus = (bf, (m_fus, d))
        add((b, n, i), [types, (bf, (b, n, 3 * i))],
            "zorro_attn_fwd (packed qkv, Pallas)", attn_fwd)
        add((b, n, 3 * i), [types, (bf, (b, n, 3 * i)),
                            (bf, (b, n, i)), (bf, (b, n, i))],
            "zorro_attn_bwd (packed qkv, Pallas)", 2.5 * attn_fwd)
        add((m_enc, d), [x_enc, bias, w_in, w_out],
            "encoder_geglu_ffn_fwd (Pallas)", geglu(m_enc))
        add((m_enc, d), [x_enc, bias, w_in, w_out] * 2,
            "encoder_geglu_ffn_bwd (Pallas)", 16.0 / 6.0 * geglu(m_enc))
        add((m_fus, d), [x_fus, bias, w_in, w_out],
            "fusion_geglu_ffn_fwd (Pallas)", geglu(m_fus))
        add((m_fus, d), [x_fus, bias, w_in, w_out] * 2,
            "fusion_geglu_ffn_bwd (Pallas)", 16.0 / 6.0 * geglu(m_fus))
        # fusion-row slot attention (ops/pallas_fusion_attn.py): x [b,f,d],
        # t-major KV grid [b, t*f, 2d], packed q/k of the slots [b,f,2d]
        add((b, f, d), [(bf, (b, f, d)), (bf, (b, t * f, 2 * d)),
                        (bf, (b, f, 2 * d))],
            "fusion_row_attn_fwd (Pallas)", fus_row_fwd)
        add((b, f, d), [(bf, (b, f, d)), (bf, (b, t * f, 2 * d)),
                        (bf, (b, f, 2 * d))] * 2,
            "fusion_row_attn_bwd (Pallas)", 2.5 * fus_row_fwd)
        # reconstruction decoder blocks (2 tasks x depth): small-N attention
        # + plain-MLP kernels at decoder width
        dqkv = (bf, (b, nd, 3 * dd))
        add((b, nd, dd), [dqkv], "decoder_attn_fwd n=%d (Pallas)" % nd,
            dec_attn_fwd)
        add((b, nd, 3 * dd), [dqkv, (bf, (b, nd, dd)), (bf, (b, nd, dd))],
            "decoder_attn_bwd (Pallas)", 2.5 * dec_attn_fwd)
        xd, w1, b1, w2, b2 = (bf, (m_dec, dd)), (bf, (dd, 4 * dd)), \
            (bf, (1, 4 * dd)), (bf, (4 * dd, dd)), (bf, (1, dd))
        add((m_dec, dd), [xd, w1, b1, w2, b2],
            "decoder_mlp_fwd (Pallas)", dec_mlp_fwd)
        add((m_dec, dd), [xd, w1, b1, w2, b2] * 2,
            "decoder_mlp_bwd (Pallas)", 2.5 * dec_mlp_fwd)

    def identify(self, long_name: str):
        """Return (label, flops); unknown kernels get a shape label + 0."""
        shapes = _shapes_in(long_name.split("custom_call_target")[0])
        if not shapes:
            return ("custom ?", 0.0)
        res, ops = shapes[0], tuple(sorted(shapes[1:]))
        hit = self.sig.get((res, ops))
        if hit:
            return hit
        return (f"custom {res[0]}{list(res[1])} x{len(ops)}ops", 0.0)


def capture(out_dir: str, n_steps: int):
    from profile_step import capture as cap

    cap(out_dir, n_steps)


def analyze(trace_dir: str, n_steps: int, top: int, out_path: str | None):
    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig,
    )

    cfg = PretrainConfig(
        data=DataConfig(input_size=256, patch_size=16,
                        in_domains=("s1", "s2"), out_domains=("s1", "s2"),
                        batch_size=60),
        mask=MaskConfig(num_encoded_tokens=384),
    )
    catalog = KernelCatalog(cfg)

    files = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace.json.gz under {trace_dir}"
    d = json.loads(gzip.open(sorted(files)[-1]).read())
    events = d["traceEvents"]

    # the per-op device lane is the thread named "XLA Ops" under the TPU
    # process (the device pid also carries "Steps" and "XLA Modules" lanes —
    # summing those would triple-count the step)
    pnames, tnames = {}, {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pnames[ev["pid"]] = ev.get("args", {}).get("name", "")
            elif ev.get("name") == "thread_name":
                tnames[(ev["pid"], ev.get("tid"))] = \
                    ev.get("args", {}).get("name", "")
    op_lanes = {k for k, nm in tnames.items() if nm == "XLA Ops"
                and ("TPU" in pnames.get(k[0], "")
                     or "device" in pnames.get(k[0], "").lower())}
    if not op_lanes:  # CPU-backend traces: fall back to any XLA Ops lane
        op_lanes = {k for k, nm in tnames.items() if nm == "XLA Ops"}
    assert op_lanes, f"no 'XLA Ops' lane in trace (threads: {set(tnames.values())})"

    # group per-layer instances of the same computation: custom calls by
    # catalog label, everything else by (category, base name, result shape)
    groups = defaultdict(lambda: {"us": 0.0, "calls": 0, "flops": 0.0,
                                  "bytes": 0.0, "src": ""})
    total_us = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_lanes:
            continue
        a = ev.get("args", {})
        ln = a.get("long_name", ev["name"])
        cat = a.get("hlo_category", "")
        flops = float(a.get("model_flops", 0) or 0)
        bts = float(a.get("raw_bytes_accessed", 0) or 0)
        base = re.sub(r"[.\d]+$", "", ev["name"])
        kind = "xla"
        if cat == "custom-call":
            kind = "pallas"
            label, flops = catalog.identify(ln)
            # minimum HBM traffic: operands read once + result written once
            bts = float(_shape_bytes(
                _shapes_in(ln.split("custom_call_target")[0])))
        elif "async" in cat or base in ("copy-start", "copy-done",
                                        "slice-done", "all-reduce-start"):
            # async DMAs: their bytes move in the background, overlapped
            # with compute — the lane only records the wait. Excluded from
            # the serial floor.
            kind = "dma"
            label = f"{base} [{cat}]"
            flops = 0.0
        else:
            m = _SHAPE_RE.search(ln)
            res = f"{m.group(1)}[{m.group(2)}]" if m else ""
            label = f"{base} {res}" + (f" [{cat}]" if cat else "")
            # XLA's raw_bytes_accessed is a MODEL count (every operand use
            # at full size — broadcasts and multi-use operands overcount;
            # several fusions would "exceed" HBM bandwidth). Use the same
            # minimum-traffic model as the Pallas rows: unique operands
            # read once + result written once, parsed from the HLO line.
            min_b = _shape_bytes(_shapes_in(ln.split(", calls=")[0]))
            if 0 < min_b < bts:
                bts = float(min_b)
        g = groups[(kind, label)]
        g["us"] += ev["dur"]
        g["calls"] += 1
        g["flops"] += flops
        g["bytes"] += bts
        src = a.get("source", "")
        if src and not g["src"]:
            g["src"] = src.split("/")[-1]
        total_us += ev["dur"]

    rows = []
    floor_ms_total = 0.0
    sum_flops = sum_bytes = 0.0
    for (kind, label), g in groups.items():
        ms = g["us"] / 1e3 / max(n_steps, 1)
        flops = g["flops"] / max(n_steps, 1)
        bts = g["bytes"] / max(n_steps, 1)
        t = ms / 1e3
        ai = flops / bts if bts else None
        bound_s = max(flops / PEAK_FLOPS, bts / PEAK_BW)
        # an op's true requirement can never exceed what it measurably took
        # (XLA's byte accounting overcounts broadcast/multi-use operands on
        # some fusions past HBM bandwidth; the cap keeps the floor sound)
        bound_s = min(bound_s, t)
        if kind == "dma":
            bound_s = 0.0  # overlaps compute; its cost is the wait we see
        else:
            floor_ms_total += bound_s * 1e3
            sum_flops += flops
            sum_bytes += bts
        rows.append({
            "op": label[:90], "kind": kind, "source": g["src"][:60],
            "calls_per_step": g["calls"] // max(n_steps, 1),
            "ms_per_step": round(ms, 3),
            "gflops_per_step": round(flops / 1e9, 2),
            "mb_per_step": round(bts / 1e6, 2),
            "achieved_tflops": round(flops / t / 1e12, 1) if t > 0 else 0.0,
            "achieved_gbs": round(bts / t / 1e9, 1) if t > 0 else 0.0,
            "arith_intensity": round(ai, 1) if ai is not None else None,
            "class": "dma(overlap)" if kind == "dma" else
                     (("compute" if (ai or 0) >= RIDGE else "memory")
                      if (flops or bts) else "unknown"),
            "attainable_ms": round(bound_s * 1e3, 3),
            "pct_of_attainable": round(100 * bound_s * 1e3 / ms, 1)
                                  if ms > 0 and bound_s > 0 else None,
        })
    rows.sort(key=lambda r: -r["ms_per_step"])

    total_ms = total_us / 1e3 / max(n_steps, 1)
    result = {
        "config": "bench flagship: 192d/12L/h3xdh64, s1+s2, batch 60, bf16",
        "peaks": {"tflops_bf16": PEAK_FLOPS / 1e12, "hbm_gbs": PEAK_BW / 1e9,
                  "ridge_flop_per_byte": round(RIDGE, 1)},
        "total_device_ms_per_step": round(total_ms, 2),
        "roofline_floor_ms_per_step": round(floor_ms_total, 2),
        "floor_note": "sum over all non-DMA device ops of "
                      "max(flops/peak_flops, bytes/peak_bw) — the time a "
                      "perfect implementation of this exact op sequence "
                      "needs; async DMAs excluded (they overlap compute)",
        "step_flops_tflop": round(sum_flops / 1e12, 3),
        "step_hbm_gb": round(sum_bytes / 1e9, 3),
        "global_bound_ms": round(1e3 * max(sum_flops / PEAK_FLOPS,
                                           sum_bytes / PEAK_BW), 2),
        "ops": rows[:top],
        "residue_ms_per_step": round(
            sum(r["ms_per_step"] for r in rows[top:]), 3),
        "residue_attainable_ms": round(
            sum(r["attainable_ms"] for r in rows[top:]), 3),
    }
    print(f"device total: {result['total_device_ms_per_step']} ms/step; "
          f"roofline floor: {result['roofline_floor_ms_per_step']} ms/step; "
          f"ridge {RIDGE:.0f} flop/byte")
    print("| op | kind | calls | ms/step | GFLOP | MB | TF/s | GB/s | AI | "
          "class | attainable ms | % attainable |")
    print("|" + "---|" * 12)
    for r in result["ops"]:
        print(f"| {r['op'][:52]} | {r['kind']} | {r['calls_per_step']} | "
              f"{r['ms_per_step']} | {r['gflops_per_step']} | "
              f"{r['mb_per_step']} | {r['achieved_tflops']} | "
              f"{r['achieved_gbs']} | {r['arith_intensity']} | {r['class']} | "
              f"{r['attainable_ms']} | {r['pct_of_attainable']} |")
    print(f"| (all remaining ops) |  |  | {result['residue_ms_per_step']} |  "
          f"|  |  |  |  |  | {result['residue_attainable_ms']} |  |")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--trace", default="/tmp/prof_roofline")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.trace, args.steps)
    analyze(args.trace, args.steps, args.top, args.out)


if __name__ == "__main__":
    main()
