"""Orbax checkpointing (TPU-native replacement for
pretraining/utils/checkpoint.py: rank-0 torch.save of
model/optimizer/epoch/scaler + auto-resume from the latest
``checkpoint-*.pth``; Orbax handles multi-host coordination and async
writes, so no rank gating is needed)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, state: Any) -> None:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"checkpoint-{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("checkpoint-"):
            try:
                steps.append(int(name.split("-", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, state: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `state` (auto_load_model equivalent,
    checkpoint.py:103-134). Returns `state` unchanged if nothing to restore."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
    if step is None:
        return state
    path = os.path.join(directory, f"checkpoint-{step}")
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
        return ckptr.restore(path, abstract)
