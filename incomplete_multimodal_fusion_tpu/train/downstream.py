"""Downstream segmentation trainer
(reference downstream/instance_segmentation/maskformer_train_ins_vit.py:39-369
and semantic maskformer_train_seg.py).

Train step: random modality subset -> keep-ratio masking -> MaskFormer
forward -> set criterion with deep supervision -> weighted total
``0.3*ce + 0.3*dice + 0.4*mask`` (:228) -> AdamW with full-model grad clip
(:66-99 wrapper; SOLVER.CLIP_GRADIENTS.CLIP_VALUE=0.01) and frozen backbone
stages via a zero-update optax mask (_freeze_stages :682-730).
Host-side ReduceLROnPlateau on eval dice (:155, :173).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..eval.metrics import binary_mask_from_labels, dice_score, semantic_inference
from ..losses.set_criterion import SegTargets, set_criterion
from ..models.maskformer import MaskFormerConfig, MaskFormerModel
from ..ops import masking


class DownstreamState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


FROZEN_PREFIXES_BACKBONE = (
    # _freeze_stages (multimae_big_imcomplete.py:682-730): input adapters,
    # fusion tokens, fusion blocks; encoder blocks 1..frozen_stages
    "backbone/input_adapter_",
    "backbone/fusion_tokens",
    "backbone/fus_block",
)


def freeze_mask(params, frozen_stages: int):
    """True = trainable."""

    def trainable(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        # the vit_adapter backbone nests the encoder one level deeper
        p_norm = p.replace("backbone/vit/", "backbone/", 1)
        if any(p_norm.startswith(f) for f in FROZEN_PREFIXES_BACKBONE):
            return False
        if p_norm.startswith("backbone/block"):
            try:
                idx = int(p_norm.split("/")[1][len("block"):])
            except ValueError:
                return True
            if 1 <= idx <= frozen_stages:
                return False
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


def create_downstream_optimizer(
    params,
    lr: float = 1e-4,
    clip_grad: float = 0.01,
    frozen_stages: int = 0,
    optimizer: str = "adamw",
):
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    if optimizer == "adamw":
        opt = optax.adamw  # AdamW defaults (maskformer cfg SOLVER)
        chain.append(optax.inject_hyperparams(opt)(learning_rate=lr))
    else:
        chain.append(
            optax.inject_hyperparams(
                lambda learning_rate: optax.sgd(learning_rate, momentum=0.9)
            )(learning_rate=lr)
        )
    tx = optax.chain(*chain)
    if frozen_stages > 0:
        frozen = jax.tree.map(lambda t: not t, freeze_mask(params, frozen_stages))
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
    return tx


def set_learning_rate(opt_state, lr: float):
    """Host-side LR override (ReduceLROnPlateau applies through this)."""

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    jax.tree.map(lambda x: x, opt_state)  # no-op traversal for pytrees
    for leaf in jax.tree.leaves(opt_state, is_leaf=lambda s: hasattr(s, "hyperparams")):
        visit(leaf)
    return opt_state


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau 'min' semantics
    (maskformer_train_ins_vit.py:155)."""

    def __init__(self, lr: float, factor: float = 0.1, patience: int = 10,
                 mode: str = "min", min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.sign = 1.0 if mode == "min" else -1.0
        self.best = float("inf")
        self.bad_epochs = 0
        self.min_lr = min_lr

    def step(self, metric: float) -> float:
        v = self.sign * metric
        if v < self.best - 1e-12:
            self.best = v
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def load_pretrained_backbone(params: Dict, pretrain_params: Dict) -> Tuple[Dict, Dict]:
    """Copy the intersection of pretraining MultiMAE params into the
    'backbone' subtree, non-strict with key reporting (reference
    checkpoint.py:26-72 + multimae_big_imcomplete.py:447-460)."""
    import flax

    flat_bb = flax.traverse_util.flatten_dict(params["backbone"])
    flat_pre = flax.traverse_util.flatten_dict(pretrain_params)
    copied, skipped, missing = [], [], []
    for k in flat_bb:
        if k in flat_pre and flat_pre[k].shape == flat_bb[k].shape:
            flat_bb[k] = flat_pre[k]
            copied.append("/".join(k))
        else:
            missing.append("/".join(k))
    for k in flat_pre:
        if k not in flat_bb:
            skipped.append("/".join(k))
    new_bb = flax.traverse_util.unflatten_dict(flat_bb)
    new_params = dict(params)
    new_params["backbone"] = new_bb
    report = {"copied": copied, "missing_in_ckpt": missing, "unused_from_ckpt": skipped}
    return new_params, report


def make_downstream_train_step(
    model: MaskFormerModel,
    cfg: MaskFormerConfig,
    tx,
    loss_weights: Tuple[float, float, float] = (0.3, 0.3, 0.4),  # ce, dice, mask
    num_points: int = 12544,
    eos_coef: float = 0.1,
    dense_masks: bool = False,
    compute_dtype: str = "bfloat16",
    match_mode: Optional[str] = None,  # 'exact' | 'auction' | 'greedy'
    # per-loss weight_dict + matching costs (maskformer_ake150.yaml:
    # CLASS_WEIGHT 2.0, MASK_WEIGHT 5.0, DICE_WEIGHT 5.0; the reference
    # multiplies these into the losses AND uses them as Hungarian costs,
    # maskformer_train_ins_vit.py:123-131, :215-228)
    class_weight: float = 2.0,
    dice_weight: float = 5.0,
    mask_weight: float = 5.0,
    per_sample_masks: bool = False,  # independent keep-mask per sample
    # Hungarian matching costs. The reference feeds the SAME weights to the
    # matcher and the loss (maskformer_train_ins_vit.py:123-131), so these
    # default to class/mask/dice_weight — override to decouple (e.g. pin the
    # assignment while sweeping loss weights; the loss terms themselves are
    # strictly linear in the weights given a fixed assignment).
    cost_class: Optional[float] = None,
    cost_mask: Optional[float] = None,
    cost_dice: Optional[float] = None,
):
    w_ce, w_dice, w_mask = loss_weights
    dtype = jnp.dtype(compute_dtype)
    in_domains = tuple(cfg.in_domains)
    nums = (cfg.num_patches,) * len(in_domains)
    e = cfg.max_encoded_tokens
    c_class = class_weight if cost_class is None else cost_class
    c_mask = mask_weight if cost_mask is None else cost_mask
    c_dice = dice_weight if cost_dice is None else cost_dice

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
        )

    def loss_fn(params, batch, targets, mask_info, present, keys,
                matched_override=None):
        out = model.apply(
            {"params": cast(params)}, cast(batch), mask_info=mask_info,
            num_encoded_tokens=e, present=present, deterministic=False,
            rngs={"dropout": keys[0]},
        )
        out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        losses = set_criterion(
            out, targets, keys[1], num_classes=cfg.num_classes,
            eos_coef=eos_coef, num_points=num_points, dense_masks=dense_masks,
            match_mode=match_mode,
            cost_class=c_class, cost_mask=c_mask, cost_dice=c_dice,
            matched_override=matched_override,
        )
        # partition by exact key prefix ('loss_ce' vs 'loss_dice' vs
        # 'loss_mask' + aux suffixes) — substring tests double-count
        l_ce = class_weight * sum(
            v for k, v in losses.items() if k.startswith("loss_ce"))
        l_dice = dice_weight * sum(
            v for k, v in losses.items() if k.startswith("loss_dice"))
        l_mask = mask_weight * sum(
            v for k, v in losses.items() if k.startswith("loss_mask"))
        total = w_ce * l_ce + w_dice * l_dice + w_mask * l_mask  # (:228)
        return total, {"loss": total, "loss_ce": l_ce, "loss_dice": l_dice,
                       "loss_mask": l_mask}

    def prologue(state: DownstreamState, batch):
        """Shared per-step randomness: BOTH phases of the exact_host split
        step derive the same (present, mask_info, keys) from state.rng, so
        the cost forward and the grad forward see identical masks/dropout."""
        rng, k_sub, k_mask, k_drop, k_crit = jax.random.split(state.rng, 5)
        present = masking.sample_modality_subset(k_sub, len(in_domains))
        mask_info = masking.incomplete_random_masks(
            k_mask, in_domains, nums, present, e,
            batch[in_domains[0]].shape[0], keep_ratio=cfg.keep_ratio,
            batch_shared=not per_sample_masks,
        )
        return rng, present, mask_info, (k_drop, k_crit)

    def train_step(state: DownstreamState, batch, targets: SegTargets,
                   matched_override=None):
        rng, present, mask_info, keys = prologue(state, batch)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, targets, mask_info, present, keys,
            matched_override,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), metrics

    def cost_step(state: DownstreamState, batch, targets: SegTargets):
        """Phase 1 of exact_host: forward (no grad) -> per-level matching
        costs [L, B, Q, G] for host scipy."""
        from ..losses.set_criterion import set_criterion_costs

        _, present, mask_info, keys = prologue(state, batch)
        out = model.apply(
            {"params": cast(state.params)}, cast(batch), mask_info=mask_info,
            num_encoded_tokens=e, present=present, deterministic=False,
            rngs={"dropout": keys[0]},
        )
        out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        return set_criterion_costs(
            out, targets, keys[1], num_points=num_points,
            cost_class=c_class, cost_mask=c_mask, cost_dice=c_dice,
        )

    train_step.cost_step = cost_step
    return train_step


def make_downstream_hostmatch_step(model, cfg, tx, **kw):
    """Exact scipy Hungarian matching WITHOUT an in-graph host callback —
    the split-step architecture for backends (like the axon-tunneled TPU)
    whose runtime rejects ``jax.pure_callback``:

      1. jitted cost phase: forward (no grad) -> per-level costs [L,B,Q,G]
      2. host: scipy ``linear_sum_assignment`` per (level, sample)
      3. jitted grad phase: the normal train step with ``matched_override``

    This is structurally what the reference itself does per step — GPU cost
    tensors, ``.cpu()`` + scipy, indices back to device (matcher_ins.py:
    147-175) — at the price of one extra no-grad forward. RNG derivation is
    shared (``prologue``), so masks/dropout/point-coords are identical across
    the two phases and the result equals the in-graph ``match_mode='exact'``
    step for the same ``state.rng``.
    """
    from ..losses.set_criterion import scipy_assign_host

    kw.pop("match_mode", None)
    base = make_downstream_train_step(model, cfg, tx, match_mode="exact", **kw)
    cost_jit = jax.jit(base.cost_step)
    grad_jit = jax.jit(base, donate_argnums=0)

    def step(state: DownstreamState, batch, targets: SegTargets):
        costs = np.asarray(jax.device_get(cost_jit(state, batch, targets)))
        matched = jnp.asarray(scipy_assign_host(costs))
        return grad_jit(state, batch, targets, matched)

    return step


def label_map_from_targets(targets: SegTargets) -> jnp.ndarray:
    """[B, H, W] label map from padded instance targets: pixel gets the label
    of the covering mask + 1 (0 = background); later instances win overlaps —
    the role of the reference eval's GT union (maskformer_train_ins_vit.py:279)."""
    b, g, h, w = targets.masks.shape
    labels = jnp.where(targets.valid, targets.labels + 1, 0)  # [B, G]
    per_inst = targets.masks * labels[:, :, None, None]
    return jnp.max(per_inst, axis=1).astype(jnp.int32)


def make_semantic_pred_step(model: MaskFormerModel, cfg: MaskFormerConfig,
                            out_size: int = 0):
    """Per-pixel class prediction for ConfMatrix AA/SA/mIoU eval
    (maskformer_train_seg.py:242-285; argmax + 1 skips the ignore class like
    mask2former_infer_seg.py:239)."""
    from ..eval.metrics import semantic_inference

    def pred_step(params, batch):
        out = model.apply({"params": params}, batch)
        masks = out["pred_masks"]
        s = out_size or cfg.image_size
        masks = jax.image.resize(masks, masks.shape[:2] + (s, s), method="bilinear")
        sem = semantic_inference(out["pred_logits"], masks)  # [B, K, H, W]
        return jnp.argmax(sem, axis=1) + 1

    return pred_step


def make_eval_step(model: MaskFormerModel, cfg: MaskFormerConfig):
    """Dice eval on full-modality inputs (maskformer_train_ins_vit.py:269-306)."""

    def eval_step(params, batch, gt_label_map):
        out = model.apply({"params": params}, batch)
        masks = out["pred_masks"]
        h, w = gt_label_map.shape[-2:]
        masks = jax.image.resize(
            masks, masks.shape[:2] + (h, w), method="bilinear"
        )
        sem = semantic_inference(out["pred_logits"], masks)  # [B, K, H, W]

        def one(sem_i, gt_i):
            gt_bin = binary_mask_from_labels(gt_i, cfg.num_classes)
            return dice_score(sem_i, gt_bin)

        return jnp.mean(jax.vmap(one)(sem, gt_label_map))

    return eval_step
