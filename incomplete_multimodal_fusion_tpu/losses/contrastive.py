"""Contrastive / self-distillation losses
(reference pretraining/multimae/criterion.py:175-335).

All run fully on device; the centered DINO variant carries its EMA center as
explicit state (JAX-functional replacement for the torch buffer,
criterion.py:280,308-317).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def dino_loss(student, teacher, teacher_temp: float = 0.04, student_temp: float = 0.1):
    """dino_loss_func (criterion.py:328-335): fusion pool = student, modality
    pool = teacher (stop-gradient)."""
    student = _l2norm(student.astype(jnp.float32), axis=1)
    teacher = _l2norm(teacher.astype(jnp.float32), axis=1)
    s = jax.nn.log_softmax(student / student_temp, axis=-1)
    t = jax.lax.stop_gradient(jax.nn.softmax(teacher / teacher_temp, axis=-1))
    return jnp.mean(jnp.sum(-t * s, axis=-1))


def byol_loss(p, z, simplified: bool = True):
    """byol_loss_func (criterion.py:319-326)."""
    p = p.astype(jnp.float32)
    z = jax.lax.stop_gradient(z.astype(jnp.float32))
    cos = jnp.sum(_l2norm(p) * _l2norm(z), axis=-1)
    return 2.0 - 2.0 * cos.mean()


def _off_diagonal(x):
    n = x.shape[0]
    return x.flatten()[:-1].reshape(n - 1, n + 1)[:, 1:].flatten()


def vicreg_loss(za, zb, l: float = 25.0, mu: float = 25.0, nu: float = 1.0):
    """vicreg (criterion.py:179-212): invariance MSE + std hinge + covariance."""
    za = za.astype(jnp.float32)
    zb = zb.astype(jnp.float32)
    sim = jnp.mean((za - zb) ** 2)
    # torch .var() defaults to the unbiased (N-1) estimator (criterion.py:181)
    std_a = jnp.sqrt(za.var(axis=0, ddof=1) + 1e-4)
    std_b = jnp.sqrt(zb.var(axis=0, ddof=1) + 1e-4)
    std = jnp.mean(jax.nn.relu(1 - std_a)) + jnp.mean(jax.nn.relu(1 - std_b))
    n, d = za.shape
    ca = (za - za.mean(0)).T @ (za - za.mean(0)) / (n - 1)
    cb = (zb - zb.mean(0)).T @ (zb - zb.mean(0)) / (n - 1)
    cov = jnp.sum(_off_diagonal(ca) ** 2) / d + jnp.sum(_off_diagonal(cb) ** 2) / d
    return l * sim + mu * std + nu * cov


def hard_negative_loss(out_1, out_2, tau_plus: float = 0.1, beta: float = 1.0,
                       temperature: float = 0.5, estimator: str = "hard"):
    """HardNegtive_loss (criterion.py:214-268): debiased hard-negative InfoNCE.

    The reference hardcodes `.cuda()` for its negative mask (criterion.py:242);
    here the mask is a static on-device tensor.
    """
    b = out_1.shape[0]
    o1 = _l2norm(out_1.astype(jnp.float32), axis=1)
    o2 = _l2norm(out_2.astype(jnp.float32), axis=1)
    out = jnp.concatenate([o1, o2], axis=0)  # [2B, D]
    sim = jnp.exp(out @ out.T / temperature)  # [2B, 2B]

    idx = jnp.arange(2 * b)
    self_mask = idx[:, None] == idx[None, :]
    pair_mask = idx[:, None] == ((idx[None, :] + b) % (2 * b))
    neg_mask = ~(self_mask | pair_mask)
    # reference reshapes to [2B, 2B-2]; keep masked-sum form (equal results)
    neg = jnp.where(neg_mask, sim, 0.0)

    pos = jnp.exp(jnp.sum(o1 * o2, axis=-1) / temperature)
    pos = jnp.concatenate([pos, pos], axis=0)

    if estimator == "hard":
        n = b * 2 - 2
        log_neg = jnp.where(neg_mask, jnp.log(jnp.maximum(sim, 1e-38)), -jnp.inf)
        imp = jnp.where(neg_mask, jnp.exp(beta * log_neg), 0.0)
        reweight = jnp.sum(imp * neg, axis=-1) / (jnp.sum(imp, axis=-1) / n)
        ng = (-tau_plus * n * pos + reweight) / (1 - tau_plus)
        ng = jnp.maximum(ng, n * jnp.e ** (-1 / temperature))
    elif estimator == "easy":
        ng = jnp.sum(neg, axis=-1)
    else:
        raise ValueError(estimator)
    return jnp.mean(-jnp.log(pos / (pos + ng)))


class DINOCenterState(NamedTuple):
    center: jnp.ndarray  # [1, D]


def init_dino_center(out_dim: int) -> DINOCenterState:
    return DINOCenterState(jnp.zeros((1, out_dim), jnp.float32))


def dino_center_loss(
    state: DINOCenterState,
    student_outputs: Sequence[jnp.ndarray],
    teacher_outputs: Sequence[jnp.ndarray],
    teacher_temp: float = 0.04,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
) -> Tuple[jnp.ndarray, DINOCenterState]:
    """DINOLoss with EMA center (criterion.py:270-317), functional form."""
    students = [_l2norm(s.astype(jnp.float32), axis=1) for s in student_outputs]
    teachers = [_l2norm(t.astype(jnp.float32), axis=1) for t in teacher_outputs]
    s_out = [jax.nn.log_softmax(s / student_temp, axis=-1) for s in students]
    t_out = [
        jax.lax.stop_gradient(jax.nn.softmax((t - state.center) / teacher_temp, axis=-1))
        for t in teachers
    ]
    total, n_terms = 0.0, 0
    for ti, t in enumerate(t_out):
        for si, s in enumerate(s_out):
            if ti == si:
                continue
            total = total + jnp.mean(jnp.sum(-t * s, axis=-1))
            n_terms += 1
    loss = total / max(n_terms, 1)
    batch_center = jnp.concatenate(teachers, axis=0).mean(axis=0, keepdims=True)
    new_center = state.center * center_momentum + (1 - center_momentum) * batch_center
    return loss, DINOCenterState(new_center)
