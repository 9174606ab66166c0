"""Model EMA (reference pretraining/utils/model_ema.py:18-131: decay-0.9999
shadow copy; present in the reference but never wired into its drivers —
here it's an opt-in part of the pretrain state, and checkpoints carry it
like checkpoint.py:92-99 intended)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    # real copies: aliasing the param buffers breaks donated train steps
    # ("attempt to donate the same buffer twice")
    return jax.tree.map(jnp.copy, params)


def update_ema(ema_params: Any, params: Any, decay: float = 0.9999) -> Any:
    return jax.tree.map(
        lambda e, p: e * decay + (1.0 - decay) * p.astype(e.dtype), ema_params, params
    )
