"""Checkpoint-resume proof ON THE REAL CHIP (round-4 verdict Do#6).

Three phases, each its OWN process (the axon tunnel serializes clients, so
run them sequentially):

    python tools/ckpt_resume_proof.py save    # k steps -> orbax save
    python tools/ckpt_resume_proof.py resume  # fresh proc: restore -> k more
    python tools/ckpt_resume_proof.py full    # fresh proc: 2k unbroken
    python tools/ckpt_resume_proof.py check   # compare, write CKPT_RESUME.json

Bit-identical continuation is asserted on every parameter leaf. Batches are
keyed by absolute step index so the resumed and unbroken runs consume the
identical stream. Flagship config at reduced batch (8) to keep compiles
modest. Reference counterpart: checkpoint.py:103-152 (restore only — the
reference never proves continuation equality).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/ckpt_resume_proof"
K = 4  # steps per half


def build():
    import jax
    import jax.numpy as jnp

    try:  # phases 2/3 reuse phase 1's executable via the persistent cache
        cache_dir = os.path.join(ROOT, ".jax_compile_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from incomplete_multimodal_fusion_tpu.config import (
        DataConfig, MaskConfig, PretrainConfig,
    )
    from incomplete_multimodal_fusion_tpu.train import pretrain

    cfg = PretrainConfig(
        data=DataConfig(input_size=256, patch_size=16,
                        in_domains=("s1", "s2"), out_domains=("s1", "s2"),
                        batch_size=8),
        mask=MaskConfig(num_encoded_tokens=384),
    )
    model, state, tx = pretrain.create_train_state(
        cfg, jax.random.PRNGKey(7), total_steps=100)
    step = jax.jit(pretrain.make_train_step(model, cfg, tx))
    return cfg, state, step


def run_steps(cfg, state, step, n):
    import jax.numpy as jnp

    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch

    metrics = None
    for _ in range(n):
        i = int(state.step)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(4000 + i), cfg.data.in_domains,
            cfg.data.batch_size, cfg.data.input_size).items()}
        state, metrics = step(state, batch)
    return state, metrics


def dump(state, metrics, path):
    import jax

    flat = {"/".join(str(p) for p in pth): np.asarray(leaf)
            for pth, leaf in
            jax.tree_util.tree_flatten_with_path(state.params)[0]}
    flat["__step__"] = np.asarray(int(state.step))
    flat["__loss__"] = np.asarray(float(metrics["loss"]))
    np.savez(path, **flat)


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "check"
    os.makedirs(WORK, exist_ok=True)
    ck = os.path.join(WORK, "ck")

    if phase == "check":
        a = np.load(os.path.join(WORK, "resumed.npz"))
        b = np.load(os.path.join(WORK, "unbroken.npz"))
        keys = [k for k in b.files if not k.startswith("__")]
        mism = [k for k in keys if not np.array_equal(a[k], b[k])]
        rec = {
            "steps_per_half": K,
            "param_leaves_compared": len(keys),
            "bit_identical": not mism,
            "mismatched_leaves": mism[:10],
            "loss_resumed": float(a["__loss__"]),
            "loss_unbroken": float(b["__loss__"]),
            "note": "flagship cfg (192d/12L, 256^2, e=384) batch 8 on the "
                    "real chip; save->fresh-process-restore->continue vs "
                    "unbroken, every param leaf bitwise equal",
        }
        print(json.dumps(rec, indent=2))
        with open(os.path.join(ROOT, "CKPT_RESUME.json"), "w") as f:
            json.dump(rec, f, indent=2)
        assert rec["bit_identical"], mism[:5]
        return

    from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt_lib

    cfg, state, step = build()
    if phase == "save":
        state, metrics = run_steps(cfg, state, step, K)
        ckpt_lib.save_checkpoint(ck, int(state.step), state)
        print("saved at step", int(state.step))
    elif phase == "resume":
        state = ckpt_lib.restore_checkpoint(ck, state)
        print("restored at step", int(state.step))
        state, metrics = run_steps(cfg, state, step, K)
        dump(state, metrics, os.path.join(WORK, "resumed.npz"))
        print("resumed half done at", int(state.step))
    elif phase == "full":
        state, metrics = run_steps(cfg, state, step, 2 * K)
        dump(state, metrics, os.path.join(WORK, "unbroken.npz"))
        print("unbroken run done at", int(state.step))
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
