"""Task-loss balancing strategies (reference pretraining/utils/task_balancing.py).

``uncertainty_weighting`` is Kendall-style homoscedastic uncertainty:
``exp(-log_var) * L + log_var`` with zero-loss masking
(task_balancing.py:21-44); the per-task log-variances live in the train
state's params so they are optimized jointly (the reference wraps the
balancer in DDP and the optimizer dict, pretrain_mmae.py:347-352).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def no_weighting(task_losses: Dict[str, jnp.ndarray], params=None) -> Dict[str, jnp.ndarray]:
    return dict(task_losses)


def init_uncertainty_params(tasks) -> Dict[str, jnp.ndarray]:
    return {t: jnp.zeros((), jnp.float32) for t in tasks}


def uncertainty_weighting(
    task_losses: Dict[str, jnp.ndarray], params: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    out = {}
    for t, loss in task_losses.items():
        log_var = params[t]
        weighted = jnp.exp(-log_var) * loss + log_var
        # zero-loss masking (task_balancing.py:38-42)
        out[t] = jnp.where(loss == 0.0, 0.0, weighted)
    return out
