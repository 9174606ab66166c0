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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

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


class FlatAdamWState(NamedTuple):
    """State for :func:`flat_adamw`: one step counter + two flat moment
    vectors (padded to a multiple of ``pad_to`` so FSDP can shard them)."""

    count: jax.Array
    mu: jax.Array
    nu: jax.Array


def flat_adamw(
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
    pad_to: int = 1024,
) -> optax.GradientTransformation:
    """AdamW over ONE raveled parameter vector instead of a pytree chain.

    The per-leaf optax chain lowers to hundreds of tiny elementwise XLA
    fusions per step (~1.8 ms of dispatch+launch soup in the step profile);
    raveling grads/params into a single flat f32 vector turns the whole
    update — clip, moments, bias correction, decoupled weight decay with the
    no-decay mask, layerwise LR decay, skip-by-grad-norm — into a handful of
    full-width VPU ops. Matches `create_optimizer`'s optax chain bit-for-bit
    (see tests/test_optim_fused.py). The wd/lr-scale masks are precomputed
    flat numpy constants; moments are padded to a `pad_to` multiple so
    `fsdp_shardings` can shard them on the data axis.

    Semantics mirror the reference's AdamW + NativeScaler
    (optim_factory.py:96-101, native_scaler.py:27-40).
    """
    b1, b2 = betas
    leaves = jax.tree.leaves(params)
    n = sum(int(l.size) for l in leaves)
    n_pad = -(-n // pad_to) * pad_to

    mask_leaves = jax.tree.leaves(wd_mask(params))
    wd_vec = np.zeros((n_pad,), bool)  # bool, not f32: 1 byte/param resident
    wd_vec[:n] = np.concatenate(
        [np.full(int(l.size), bool(m)) for l, m in zip(leaves, mask_leaves)]
    )
    wd_vec = jnp.asarray(wd_vec)

    ld_vec = None
    if layer_decay is not None and layer_decay < 1.0:
        ld_leaves = jax.tree.leaves(layer_decay_scales(params, num_layers, layer_decay))
        arr = np.ones((n_pad,), np.float32)
        arr[:n] = np.concatenate(
            [np.full(int(l.size), float(s), np.float32) for l, s in zip(leaves, ld_leaves)]
        )
        ld_vec = jnp.asarray(arr)

    def _ravel(tree):
        flat, unravel = ravel_pytree(tree)
        flat = flat.astype(jnp.float32)
        if n_pad != n:
            flat = jnp.concatenate([flat, jnp.zeros((n_pad - n,), jnp.float32)])
        return flat, unravel

    def init(params):
        z = jnp.zeros((n_pad,), jnp.float32)
        return FlatAdamWState(count=jnp.zeros([], jnp.int32), mu=z, nu=jnp.zeros_like(z))

    def update(grads, state, params=None):
        g, _ = _ravel(grads)
        p, unravel = _ravel(params)
        gnorm = jnp.sqrt(jnp.sum(g * g))  # raw norm: the skip guard's input
        if clip_grad is not None:
            g = g * jnp.where(gnorm > clip_grad, clip_grad / gnorm, 1.0)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        cf = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** cf)
        nu_hat = nu / (1.0 - b2 ** cf)
        # schedules evaluated at the PRE-increment count, matching
        # optax.inject_hyperparams' step convention in create_optimizer
        lr = lr_schedule(state.count)
        wd = wd_schedule(state.count)
        decay = jnp.where(wd_vec, wd, 0.0)  # bool mask -> scheduled wd
        upd = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + decay * p)
        if ld_vec is not None:
            upd = upd * ld_vec
        if skip_grad is not None:
            skip = gnorm >= skip_grad
            upd = jnp.where(skip, 0.0, upd)
            mu = jnp.where(skip, state.mu, mu)
            nu = jnp.where(skip, state.nu, nu)
            count = jnp.where(skip, state.count, count)
        return unravel(upd[:n]), FlatAdamWState(count, mu, nu)

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
    fused: bool = False,
) -> optax.GradientTransformation:
    if fused:
        return flat_adamw(
            params, lr_schedule, wd_schedule,
            betas=betas, eps=eps, clip_grad=clip_grad, skip_grad=skip_grad,
            layer_decay=layer_decay, num_layers=num_layers,
        )
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
