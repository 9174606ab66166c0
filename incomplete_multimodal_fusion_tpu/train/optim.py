"""Optimizer factory (reference pretraining/utils/optim_factory.py and the
AMP NativeScaler semantics, utils/native_scaler.py:14-62).

TPU notes: bf16 training needs no loss scaler; what survives from
NativeScaler is (a) gradient clipping by global norm and (b) the
skip-update-if-grad-norm-too-large guard (native_scaler.py:27-40), both as
optax transforms. Weight-decay masking reproduces the no-decay rules
(optim_factory.py:49-72): 1-D params, biases, and the model's token/posemb
parameters decay-free.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_NAMES = (
    "pos_emb",
    "class_emb",
    "fusion_tokens",
    "return_tokens",
    "return_token_",
    "mask_embedding",
    "task_emb",
    "gamma",
    "beta",
)


def wd_mask(params) -> object:
    """True = apply weight decay."""

    def keep(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(n) for n in names)
        if leaf.ndim <= 1:
            return False
        return not any(nd in joined for nd in NO_DECAY_NAMES)

    return jax.tree_util.tree_map_with_path(keep, params)


def skip_by_grad_norm(inner: optax.GradientTransformation, threshold: float):
    """Skip the entire update (params AND optimizer moments) when the raw
    gradient global-norm exceeds `threshold` (native_scaler.py:27-32)."""

    def init(params):
        return inner.init(params)

    def update(grads, state, params=None):
        gnorm = optax.global_norm(grads)
        new_updates, new_state = inner.update(grads, state, params)
        skip = gnorm >= threshold
        updates = jax.tree.map(lambda u: jnp.where(skip, jnp.zeros_like(u), u), new_updates)
        keep_state = jax.tree.map(
            lambda new, old: jnp.where(skip, old, new), new_state, state
        )
        return updates, keep_state

    return optax.GradientTransformation(init, update)


def get_num_layer_for_vit(path: str, num_layers: int) -> int:
    """Layer id for layerwise LR decay (optim_factory.py:49-64
    get_num_layer_for_vit): embeddings/adapters = 0, block i = i+1,
    everything else (heads, norms, pools) = num_layers."""
    parts = path.split("/")
    head = parts[0] if parts else path
    if head.startswith(("input_adapter", "pos_emb", "fusion_tokens", "mask_embedding")):
        return 0
    if head.startswith(("block", "fus_block")):
        try:
            return int("".join(c for c in head.split("block")[-1] if c.isdigit())) + 1
        except ValueError:
            return num_layers + 1
    return num_layers + 1  # heads/norms/pools: scale 1.0 (optim_factory.py:95)


def layer_decay_scales(params, num_layers: int, decay: float):
    """LayerDecayValueAssigner (optim_factory.py:66-101): per-leaf LR scale
    decay**(num_layers+1-layer_id) as a pytree for optax scaling."""

    def f(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        layer = get_num_layer_for_vit(p, num_layers)
        return decay ** (num_layers + 1 - layer)

    return jax.tree_util.tree_map_with_path(f, params)


def scale_by_layer_decay(scales) -> optax.GradientTransformation:
    """Multiply updates by per-leaf LR scales (param-group lr_scale role)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def create_optimizer(
    params,
    lr_schedule,
    wd_schedule,
    *,
    betas=(0.9, 0.95),
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
    skip_grad: Optional[float] = None,
    layer_decay: Optional[float] = None,
    num_layers: int = 12,
) -> optax.GradientTransformation:
    mask = wd_mask(params)
    ld_scales = (
        layer_decay_scales(params, num_layers, layer_decay)
        if layer_decay is not None and layer_decay < 1.0
        else None
    )

    def make(learning_rate, weight_decay):
        chain = []
        if clip_grad is not None:
            chain.append(optax.clip_by_global_norm(clip_grad))
        chain.append(
            optax.adamw(
                learning_rate=learning_rate,
                b1=betas[0],
                b2=betas[1],
                eps=eps,
                weight_decay=weight_decay,
                mask=mask,
            )
        )
        if ld_scales is not None:
            chain.append(scale_by_layer_decay(ld_scales))
        return optax.chain(*chain)

    tx = optax.inject_hyperparams(make)(learning_rate=lr_schedule, weight_decay=wd_schedule)
    if skip_grad is not None:
        tx = skip_by_grad_norm(tx, skip_grad)
    return tx
