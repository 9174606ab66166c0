"""Pretraining step + loop (reference pretraining/pretrain_mmae.py:251-556).

One jitted SPMD train step: Dirichlet masking, MultiMAE forward in bf16,
masked reconstruction losses + DINO-style contrastive term
(``total = sum(weighted task losses) + contra_weight * loss_contra``,
pretrain_mmae.py:493-500), AdamW with per-step cosine LR/WD.

Data parallelism: the batch is sharded over the mesh's ``data`` axis, params
replicated (or TP-sharded); gradient all-reduce is inserted by XLA — the
TPU-native equivalent of DDP (pretrain_mmae.py:342-349).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from .. import modalities as modreg
from ..config import PretrainConfig
from ..losses import (LOSS_FNS, PATCH_LOSS_FNS, dino_loss, no_weighting,
                      uncertainty_weighting, init_uncertainty_params)
from ..models.multimae import MultiMAE, build_multimae
from ..ops import masking
from . import optim as optim_lib
from . import schedules


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    balancer_params: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None  # optional shadow copy (train/ema.py)
    bal_opt_state: Any = None  # balancer AdamW moments (optim_factory.py:137-149)


class Optimizers(struct.PyTreeNode):
    """Model + optional balancer transforms, mirroring the reference's
    two-param-group optimizer (optim_factory.py:137-149: the balancer
    log-vars get their own AdamW group with lr = schedule * balancer_lr_scale,
    pretrain_mmae.py:443 ``param_group['lr'] = lr_schedule * lr_scale``)."""

    model: Any = struct.field(pytree_node=False)
    balancer: Any = struct.field(pytree_node=False, default=None)


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def init_model(model: MultiMAE, cfg: PretrainConfig, rng: jax.Array):
    """Initialize params with a dummy batch (shapes only)."""
    batch = dummy_batch(cfg, batch_size=2)
    mi = masking.full_visible_mask_info(
        tuple(cfg.data.in_domains),
        tuple(cfg.data.num_patches for _ in cfg.data.in_domains),
        batch_size=2,
    )
    total = cfg.data.num_patches * len(cfg.data.in_domains)
    # jit the init: eager flax init dispatches thousands of tiny ops —
    # ~5 min through the tunneled backend vs seconds jitted (and the
    # compiled init lands in the persistent compile cache)
    variables = jax.jit(model.init, static_argnums=3)(rng, batch, mi, total)
    return variables["params"]


def dummy_batch(cfg: PretrainConfig, batch_size: int) -> Dict[str, jnp.ndarray]:
    out = {}
    s = cfg.data.input_size
    for d in cfg.data.in_domains:
        spec = modreg.get(d)
        if spec.adapter == "semseg":
            out[d] = jnp.zeros((batch_size, s, s), jnp.int32)
        else:
            out[d] = jnp.zeros((batch_size, s, s, spec.num_channels), jnp.float32)
    return out


def make_loss_fn(model: MultiMAE, cfg: PretrainConfig, pp_mesh=None,
                 pp_microbatches: int = 0, sp=None):
    in_domains = tuple(cfg.data.in_domains)
    out_domains = tuple(cfg.data.out_domains)
    e = cfg.mask.num_encoded_tokens
    compute_dtype = jnp.dtype(cfg.train.compute_dtype)
    balancer = (
        uncertainty_weighting if cfg.optim.task_balancer == "uncertainty" else
        (lambda tl, p: no_weighting(tl))
    )

    def loss_fn(params, balancer_params, batch, mask_info, dropout_rng):
        cast_params = cast_tree(params, compute_dtype)
        cast_batch = {
            d: (batch[d].astype(compute_dtype)
                if jnp.issubdtype(batch[d].dtype, jnp.floating) else batch[d])
            for d in in_domains
        }
        trunk_fn = None
        if pp_mesh is not None:
            # pipeline-parallel trunk over the stage axis: built from the
            # SAME cast params being differentiated, so grads flow through
            # the stage stacking (parallel/pp_multimae.py)
            from ..parallel.pp_multimae import make_pp_trunk

            trunk_fn = make_pp_trunk(
                model, cast_params, pp_mesh, microbatches=pp_microbatches)
        out = model.apply(
            {"params": cast_params},
            cast_batch,
            mask_info,
            e,
            deterministic=False,
            rngs={"dropout": dropout_rng},
            trunk_fn=trunk_fn,
            sp=sp,
        )
        task_losses = {}
        preds_patch = out.get("preds_patch")
        for d in out_domains:
            spec = modreg.get(d)
            mask = None if cfg.train.loss_on_unmasked else mask_info.task_masks[d]
            if (preds_patch is not None and spec.loss in PATCH_LOSS_FNS
                    and getattr(cfg.train, "patch_space_losses", True)):
                # patch-layout fast path: no pred unpatchify, no norm-pix
                # transpose-back, no pixel mask upsample (losses/masked.py)
                task_losses[d] = PATCH_LOSS_FNS[spec.loss](
                    preds_patch[d], batch[d], mask,
                    patch_size=cfg.data.patch_size, stride=spec.stride_level,
                )
            else:
                task_losses[d] = LOSS_FNS[spec.loss](
                    out["preds"][d], batch[d], mask,
                    patch_size=cfg.data.patch_size, stride=spec.stride_level,
                )
        # contrastive: student = fusion-stream pool at modality positions,
        # teacher = modality-token pool (pretrain_mmae.py:488-493)
        pooled = out["pooled"].astype(jnp.float32)
        contra = 0.0
        for i, d in enumerate(in_domains):
            contra = contra + dino_loss(out["pooled_mod"][d], pooled[:, i, :])
        weighted = balancer(task_losses, balancer_params)
        loss = sum(weighted.values()) + cfg.train.contra_weight * contra
        metrics = {f"{d}_loss": task_losses[d] for d in out_domains}
        metrics.update(loss=loss, contra_loss=contra,
                       recon_loss=sum(task_losses.values()))
        return loss, metrics

    return loss_fn


def make_train_step(model: MultiMAE, cfg: PretrainConfig, tx, pp_mesh=None,
                    pp_microbatches: int = 0, sp=None):
    loss_fn = make_loss_fn(model, cfg, pp_mesh=pp_mesh,
                           pp_microbatches=pp_microbatches, sp=sp)
    in_domains = tuple(cfg.data.in_domains)
    nums = tuple(cfg.data.num_patches for _ in in_domains)
    e = cfg.mask.num_encoded_tokens
    if isinstance(tx, Optimizers):
        tx, bal_tx = tx.model, tx.balancer
    else:
        bal_tx = None  # back-compat: bare transform, SGD fallback for balancer

    def train_step(state: TrainState, batch):
        rng, mask_rng, dropout_rng = jax.random.split(state.rng, 3)
        b = batch[in_domains[0]].shape[0]
        mask_info = masking.generate_random_masks(
            mask_rng, in_domains, nums, e, b,
            alphas=cfg.mask.alphas,
            sample_tasks_uniformly=cfg.mask.sample_tasks_uniformly,
        )
        (loss, metrics), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, state.balancer_params, batch, mask_info, dropout_rng
        )
        g_params, g_bal = grads
        # ravel (not per-leaf tree-reduce) so XLA can CSE this concat with the
        # fused optimizer's own ravel of the same gradients
        flat_g, _ = ravel_pytree(g_params)
        metrics["grad_norm"] = jnp.sqrt(
            jnp.sum(jnp.square(flat_g.astype(jnp.float32))))
        updates, opt_state = tx.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # balancer log-vars: their own AdamW param group riding the real LR
        # schedule scaled by balancer_lr_scale (optim_factory.py:137-149,
        # pretrain_mmae.py:440-445)
        bal_opt_state = state.bal_opt_state
        if cfg.optim.task_balancer != "none" and bal_tx is not None:
            bal_updates, bal_opt_state = bal_tx.update(
                g_bal, state.bal_opt_state, state.balancer_params
            )
            params_bal = optax.apply_updates(state.balancer_params, bal_updates)
        elif cfg.optim.task_balancer != "none":
            params_bal = jax.tree.map(
                lambda p, g: p - cfg.optim.balancer_lr_scale * 1e-3 * g,
                state.balancer_params, g_bal,
            )
        else:
            params_bal = state.balancer_params
        ema = state.ema_params
        if cfg.train.use_ema and ema is not None:
            from .ema import update_ema

            ema = update_ema(ema, params, cfg.train.ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            balancer_params=params_bal,
            opt_state=opt_state,
            rng=rng,
            ema_params=ema,
            bal_opt_state=bal_opt_state,
        )
        return new_state, metrics

    return train_step


def make_multi_step(train_step, k: int):
    """Run K train steps in ONE device dispatch via lax.scan.

    TPU-native loop structure: per-step host dispatch through the remote
    tunnel costs ~1.5 ms that cannot overlap device compute; scanning K
    steps amortizes it K-fold. ``batches`` is the K-stacked batch pytree
    ({d: [K, B, H, W, C]}), fed by a K-deep host prefetch — the training
    semantics are EXACTLY K sequential train_step calls (scan carries the
    full TrainState; metrics returned for every step, [K]-stacked).
    """
    def multi_step(state: TrainState, batches):
        return jax.lax.scan(lambda s, b: train_step(s, b), state, batches)

    return multi_step


def create_train_state(
    cfg: PretrainConfig,
    rng: jax.Array,
    total_steps: int,
    total_batch_size: Optional[int] = None,
) -> Tuple[MultiMAE, TrainState, Any]:
    """Build model, params, optimizer, state. Returns (model, state, tx)."""
    model = build_multimae(cfg)
    init_rng, state_rng = jax.random.split(rng)
    params = init_model(model, cfg, init_rng)

    total_batch = total_batch_size or cfg.data.batch_size
    steps_per_epoch = max(total_steps // max(cfg.train.epochs, 1), 1)
    lr = schedules.scaled_lr(cfg.optim.blr, total_batch)
    lr_sched = schedules.cosine_scheduler(
        lr, cfg.optim.min_lr, total_steps,
        warmup_steps=cfg.optim.warmup_epochs * steps_per_epoch,
        start_warmup_value=cfg.optim.warmup_lr,
    )
    wd_end = (
        cfg.optim.weight_decay_end
        if cfg.optim.weight_decay_end is not None
        else cfg.optim.weight_decay
    )
    wd_sched = schedules.cosine_scheduler(cfg.optim.weight_decay, wd_end, total_steps)
    tx = optim_lib.create_optimizer(
        params, lr_sched, wd_sched,
        betas=cfg.optim.opt_betas, eps=cfg.optim.opt_eps,
        clip_grad=cfg.optim.clip_grad, skip_grad=cfg.optim.skip_grad,
        fused=getattr(cfg.optim, "fused_adamw", False),
    )
    balancer_params = (
        init_uncertainty_params(cfg.data.out_domains)
        if cfg.optim.task_balancer == "uncertainty"
        else {}
    )
    # the reference's dict-form optimizer gives the balancer its own AdamW
    # param group: lr = schedule * balancer_lr_scale, scheduled weight decay
    # (optim_factory.py:137-149, pretrain_mmae.py:440-445). (Note the
    # reference's dict branch also silently drops ALL weight-decay masking in
    # that mode — an evident accident we deliberately do not reproduce for
    # the model group.)
    bal_tx = None
    if cfg.optim.task_balancer != "none":
        scale = cfg.optim.balancer_lr_scale
        bal_tx = optax.inject_hyperparams(
            lambda learning_rate, weight_decay: optax.adamw(
                learning_rate, b1=cfg.optim.opt_betas[0], b2=cfg.optim.opt_betas[1],
                eps=cfg.optim.opt_eps, weight_decay=weight_decay,
            )
        )(
            learning_rate=lambda step: lr_sched(step) * scale,
            weight_decay=wd_sched,
        )
    ema_params = None
    if cfg.train.use_ema:
        from .ema import init_ema

        ema_params = init_ema(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        balancer_params=balancer_params,
        opt_state=tx.init(params),
        rng=state_rng,
        ema_params=ema_params,
        bal_opt_state=bal_tx.init(balancer_params) if bal_tx is not None else None,
    )
    return model, state, Optimizers(model=tx, balancer=bal_tx)
