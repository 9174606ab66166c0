#!/usr/bin/env python
"""Pretraining CLI (reference pretraining/pretrain_mmae.py:75-185, 251-418).

Usage:
  python scripts/pretrain.py -c config.yaml [--epochs N] [--data_path DIR] ...

Flag names mirror the reference where they still make sense on TPU; DDP /
AMP / loss-scaler flags disappear (SPMD mesh + bf16 replace them).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser("MultiMAE TPU pre-training")
    p.add_argument("-c", "--config", default="", help="YAML config file")
    p.add_argument("--batch_size", type=int, default=None, help="per-replica batch")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    p.add_argument("--save_ckpt_freq", type=int, default=None)
    p.add_argument("--in_domains", type=str, default=None, help="hyphen separated")
    p.add_argument("--out_domains", type=str, default=None)
    p.add_argument("--model_size", type=str, default="tiny",
                   choices=["tiny", "base", "large", "tiny_tpu", "base_tpu"])
    p.add_argument("--fusion_mode", type=str, default=None,
                   choices=["crossattn", "zorro", "lstm"])
    p.add_argument("--use_ema", action="store_true", default=None,
                   help="maintain a decay-0.9999 model EMA shadow")
    p.add_argument("--num_encoded_tokens", type=int, default=None)
    p.add_argument("--patch_size", type=int, default=None)
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--alphas", type=float, default=None)
    p.add_argument("--sample_tasks_uniformly", action="store_true", default=None)
    p.add_argument("--blr", type=float, default=None)
    p.add_argument("--warmup_epochs", type=int, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--skip_grad", type=float, default=None)
    p.add_argument("--task_balancer", type=str, default=None)
    p.add_argument("--fused_adamw", action="store_true", default=None,
                   help="flat-vector fused AdamW (default on; numerically "
                        "identical to the optax chain)")
    p.add_argument("--no_fused_adamw", action="store_false", dest="fused_adamw")
    p.add_argument("--data_path", type=str, default=None,
                   help="DFC2023-layout dir; synthetic data if empty")
    p.add_argument("--random_crop", action="store_true",
                   help="load rasters at 2x input size and take a shared "
                        "random crop per sample (multimodal_dfc2023.py:54-94)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: devices form a "
                        "(data, model) = (n_dev/tp, tp) mesh and attention/"
                        "MLP kernels shard on the hidden dim (SCALING.md)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style sharding of params + optimizer moments "
                        "over the data axis (composes with --tp)")
    p.add_argument("--sp", action="store_true",
                   help="sequence parallelism: residual stream sharded over "
                        "the model axis between blocks (needs --tp > 1)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages: devices form a "
                        "(data, stage) = (n_dev/pp, pp) mesh and the "
                        "(FusionBlock, EncoderBlock) layer pairs run "
                        "GPipe-microbatched (parallel/pp_multimae.py; "
                        "model depth must divide pp; excludes --tp/--sp)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatch count (default: = --pp)")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="train steps per device dispatch (lax.scan over a "
                        "K-stacked batch; amortizes per-dispatch latency on "
                        "remote/tunneled runtimes — semantics identical to "
                        "K sequential steps)")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--no_auto_resume", action="store_false", dest="auto_resume")
    p.add_argument("--compute_dtype", type=str, default=None)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of a few post-compile "
                        "steps to this directory (SURVEY §5)")
    p.add_argument("--profile_start", type=int, default=10)
    p.add_argument("--profile_steps", type=int, default=3)
    # experiment tracking (pretrain_mmae.py:159-166); offline envs fall back
    # to a local jsonl automatically
    p.add_argument("--log_wandb", action="store_true")
    p.add_argument("--wandb_entity", type=str, default="")
    p.add_argument("--wandb_project", type=str, default="imf-tpu")
    p.add_argument("--wandb_run_name", type=str, default="")
    return p.parse_args()


def build_config(args):
    from incomplete_multimodal_fusion_tpu import config as cfg_lib

    if args.config:
        with open(args.config) as f:
            cfg = cfg_lib.from_yaml(f.read())
    else:
        cfg = cfg_lib.PretrainConfig()
    model_cfg = cfg_lib.MODEL_SIZES[args.model_size]
    if args.fusion_mode:
        model_cfg = dataclasses.replace(model_cfg, fusion_mode=args.fusion_mode)
    # fusion tokens must tile the patch grid (multimae_crossattn.py:87)
    input_size = args.input_size or cfg.data.input_size
    patch_size = args.patch_size or cfg.data.patch_size
    n_grid = (input_size // patch_size) ** 2
    if model_cfg.num_fusion_tokens != n_grid:
        model_cfg = dataclasses.replace(model_cfg, num_fusion_tokens=n_grid)
    data_kw = {}
    for k_arg, k_field in [("batch_size", "batch_size"), ("patch_size", "patch_size"),
                           ("input_size", "input_size"), ("data_path", "data_path")]:
        v = getattr(args, k_arg)
        if v is not None:
            data_kw[k_field] = v
    if args.in_domains:
        data_kw["in_domains"] = tuple(args.in_domains.split("-"))
    if args.out_domains:
        data_kw["out_domains"] = tuple(args.out_domains.split("-"))
    mask_kw = {}
    if args.num_encoded_tokens is not None:
        mask_kw["num_encoded_tokens"] = args.num_encoded_tokens
    if args.alphas is not None:
        mask_kw["alphas"] = args.alphas
    if args.sample_tasks_uniformly:
        mask_kw["sample_tasks_uniformly"] = True
    optim_kw = {k: getattr(args, k) for k in
                ("blr", "warmup_epochs", "weight_decay", "clip_grad", "skip_grad",
                 "task_balancer", "fused_adamw") if getattr(args, k) is not None}
    train_kw = {k: getattr(args, k) for k in
                ("epochs", "save_ckpt_freq", "seed", "output_dir", "compute_dtype",
                 "use_ema")
                if getattr(args, k) is not None}
    return cfg_lib.PretrainConfig(
        model=model_cfg,
        data=dataclasses.replace(cfg.data, **data_kw),
        mask=dataclasses.replace(cfg.mask, **mask_kw),
        decoder=cfg.decoder,
        optim=dataclasses.replace(cfg.optim, **optim_kw),
        train=dataclasses.replace(cfg.train, **train_kw),
    )


def main():
    args = get_args()
    cfg = build_config(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from incomplete_multimodal_fusion_tpu import config as cfg_lib
    from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_iterator
    from incomplete_multimodal_fusion_tpu.parallel import mesh as mesh_lib
    from incomplete_multimodal_fusion_tpu.parallel import sharding as shard_lib
    from incomplete_multimodal_fusion_tpu.train import pretrain
    from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt_lib
    from incomplete_multimodal_fusion_tpu.utils.logging import MetricLogger

    # per-replica batch: the global batch is batch_size * dp, always
    # divisible by the mesh's data axis
    n_dev = jax.device_count()
    tp = max(args.tp, 1)
    if n_dev % tp:
        raise SystemExit(f"--tp {tp} does not divide {n_dev} devices")
    if args.sp and tp == 1:
        raise SystemExit("--sp needs --tp > 1 (nothing to shard tokens over)")
    pp = max(args.pp, 1)
    if pp > 1 and (tp > 1 or args.sp):
        raise SystemExit("--pp excludes --tp/--sp (PP composes with DP only)")
    if pp > 1 and n_dev % pp:
        raise SystemExit(f"--pp {pp} does not divide {n_dev} devices")
    dp = n_dev // (tp * pp)
    if pp > 1:
        mesh = mesh_lib.make_mesh((dp, pp), ("data", "stage"),
                                  devices=jax.devices()[:n_dev])
    elif tp > 1:
        mesh = mesh_lib.make_mesh((dp, tp), ("data", "model"),
                                  devices=jax.devices()[:n_dev])
    else:
        mesh = mesh_lib.make_mesh((n_dev,), ("data",),
                                  devices=jax.devices()[:n_dev])
    global_batch = cfg.data.batch_size * dp
    steps_per_epoch = args.steps_per_epoch
    total_steps = steps_per_epoch * cfg.train.epochs

    print(f"devices={n_dev} global_batch={global_batch} total_steps={total_steps}")
    print(cfg_lib.to_yaml(cfg))

    model, state, tx = pretrain.create_train_state(
        cfg, jax.random.PRNGKey(cfg.train.seed), total_steps,
        total_batch_size=global_batch,
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Number of params: {n_params / 1e6:.2f} M")

    out_dir = cfg.train.output_dir
    os.makedirs(out_dir, exist_ok=True)
    start_step = 0
    if args.auto_resume and ckpt_lib.latest_step(out_dir) is not None:
        state = ckpt_lib.restore_checkpoint(out_dir, state)
        start_step = int(state.step)
        print(f"Resumed from step {start_step}")

    if cfg.data.data_path:
        from incomplete_multimodal_fusion_tpu.data.dfc2023 import dfc2023_iterator
        data_iter = dfc2023_iterator(
            cfg.data.data_path, cfg.data.in_domains, global_batch,
            cfg.data.input_size, seed=cfg.train.seed,
            random_crop=args.random_crop,
        )
    else:
        data_iter = synthetic_iterator(
            cfg.train.seed, cfg.data.in_domains, global_batch, cfg.data.input_size
        )

    sp_spec = None
    if args.sp:
        from incomplete_multimodal_fusion_tpu.parallel import sp as sp_lib

        sp_spec = sp_lib.SPSpec(mesh)
    raw_step = pretrain.make_train_step(
        model, cfg, tx,
        pp_mesh=mesh if pp > 1 else None,
        pp_microbatches=args.pp_microbatches,
        sp=sp_spec,
    )
    step_fn = jax.jit(raw_step, donate_argnums=0)

    model_axis = "model" if tp > 1 else None
    repl = shard_lib.replicated(mesh)
    if args.fsdp:
        p_shard = shard_lib.fsdp_shardings(state.params, mesh,
                                           model_axis=model_axis)
        o_shard = shard_lib.fsdp_shardings(state.opt_state, mesh,
                                           model_axis=model_axis)
    elif model_axis:
        p_shard = shard_lib.params_shardings(state.params, mesh,
                                             model_axis=model_axis)
        o_shard = shard_lib.params_shardings(state.opt_state, mesh,
                                             model_axis=model_axis)
    else:
        p_shard = o_shard = None
    if p_shard is None:
        state = jax.device_put(state, repl)
    else:
        state = pretrain.TrainState(
            step=jax.device_put(state.step, repl),
            params=jax.tree.map(jax.device_put, state.params, p_shard),
            balancer_params=jax.device_put(state.balancer_params, repl),
            opt_state=jax.tree.map(jax.device_put, state.opt_state, o_shard),
            rng=jax.device_put(state.rng, repl),
        )
        print(f"mesh=({dp}x{tp}) tp={tp} fsdp={args.fsdp} sp={args.sp}")

    logger = MetricLogger()
    wandb_logger = None
    if args.log_wandb:
        from incomplete_multimodal_fusion_tpu.utils.logging import WandbLogger

        wandb_logger = WandbLogger(
            config=dataclasses.asdict(cfg), project=args.wandb_project,
            entity=args.wandb_entity, run_name=args.wandb_run_name,
            out_dir=out_dir,
        )
    # multi-step dispatch: K steps per device call via lax.scan over a
    # K-stacked batch (train.pretrain.make_multi_step) — semantics are
    # exactly K sequential steps; last step's metrics are logged
    k_scan = max(args.steps_per_call, 1)
    if k_scan > 1:
        multi_fn = jax.jit(
            pretrain.make_multi_step(raw_step, k_scan), donate_argnums=0)

    log_path = os.path.join(out_dir, "log.txt")
    t_start = time.time()
    for step in range(start_step, total_steps, k_scan):
        epoch = step // steps_per_epoch
        if k_scan > 1:
            stack = [next(data_iter) for _ in range(k_scan)]
            batch = shard_lib.shard_batch(
                {k: jnp.asarray(np.stack([s[k] for s in stack]))
                 for k in stack[0]}, mesh, batch_axis=1)
            if args.profile_dir and step - start_step == args.profile_start:
                jax.profiler.start_trace(args.profile_dir)
            state, ms = multi_fn(state, batch)
            metrics = jax.tree.map(lambda x: x[-1], ms)
        else:
            batch = shard_lib.shard_batch(
                {k: jnp.asarray(v) for k, v in next(data_iter).items()}, mesh
            )
            if args.profile_dir and step - start_step == args.profile_start:
                jax.profiler.start_trace(args.profile_dir)
            state, metrics = step_fn(state, batch)
        if args.profile_dir and step - start_step == args.profile_start + args.profile_steps:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}", flush=True)
        if step % 10 == 0:
            vals = {k: float(v) for k, v in metrics.items()}
            logger.update(**vals)
            print(f"epoch {epoch} step {step}: " +
                  " ".join(f"{k}={v:.4f}" for k, v in vals.items()), flush=True)
            # non-finite-loss abort (pretrain_mmae.py:506-508). The reference
            # syncs every step; we piggyback on the logging fetch so the TPU
            # pipeline stays async — a NaN persists, so it is still caught
            # within print_freq steps.
            if not np.isfinite(vals["recon_loss"]):
                print(f"Loss is {vals['recon_loss']}, stopping training", flush=True)
                sys.exit(1)
            if wandb_logger is not None:
                wandb_logger.set_step(step)
                wandb_logger.update(vals)
        # epoch boundary: with k_scan > 1 the loop strides K steps, so test
        # whether this window crossed one rather than landing exactly on it
        done = step + k_scan
        if done % steps_per_epoch < k_scan:
            save_freq = cfg.train.save_ckpt_freq
            if (epoch + 1) % save_freq == 0 or done >= total_steps:
                ckpt_lib.save_checkpoint(out_dir, done, state)
            with open(log_path, "a") as f:
                f.write(logger.jsonl(epoch=epoch, step=step) + "\n")
    print(f"Training time {time.time() - t_start:.0f}s")


if __name__ == "__main__":
    main()
