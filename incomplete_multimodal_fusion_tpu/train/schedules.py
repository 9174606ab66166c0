"""Per-step LR / weight-decay schedules.

Matches the reference ``cosine_scheduler`` (pretraining/utils/native_scaler.py:65-82):
linear warmup from ``start_warmup_value`` to ``base_value`` over warmup steps,
then half-cosine decay to ``final_value``. Expressed as an optax-style
callable instead of a precomputed host array.
"""
from __future__ import annotations

import jax.numpy as jnp


def cosine_scheduler(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_steps: int = 0,
    start_warmup_value: float = 0.0,
):
    warmup_steps = max(int(warmup_steps), 0)
    decay_steps = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_warmup_value + step * (base_value - start_warmup_value) / max(
            warmup_steps, 1
        )
        prog = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = final_value + 0.5 * (base_value - final_value) * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def scaled_lr(blr: float, total_batch_size: int) -> float:
    """absolute_lr = base_lr * total_batch_size / 256 (pretrain_mmae.py:335)."""
    return blr * total_batch_size / 256.0
