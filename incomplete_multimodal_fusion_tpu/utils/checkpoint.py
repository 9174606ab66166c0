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


def restore_params(directory: str, params_template: Any, step: Optional[int] = None) -> Any:
    """Restore just the `params` subtree of a saved train state — works even
    when the optimizer chain (and thus opt_state structure) has changed
    (lenient-load role of reference checkpoint.py:26-72)."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
    if step is None:
        return params_template
    path = os.path.join(directory, f"checkpoint-{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            raw = ckptr.restore(path)
        except ValueError:
            # checkpoint saved under a different device topology: restore as
            # host numpy arrays instead of sharded jax.Arrays
            meta = ckptr.metadata(path)
            tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
            import numpy as np

            def to_args(node):
                if isinstance(node, dict):
                    return {k: to_args(v) for k, v in node.items()}
                if isinstance(node, (list, tuple)):
                    return [to_args(v) for v in node]
                return ocp.RestoreArgs(restore_type=np.ndarray)

            raw = ckptr.restore(path, restore_args=to_args(tree))
    source = raw.get("params", raw) if isinstance(raw, dict) else raw
    import flax

    flat_t = flax.traverse_util.flatten_dict(params_template)
    flat_s = flax.traverse_util.flatten_dict(source)
    unmatched = []
    for k in flat_t:
        if k in flat_s and flat_s[k].shape == flat_t[k].shape:
            flat_t[k] = flat_t[k].__class__(flat_s[k]) if not hasattr(flat_s[k], "device") else flat_s[k]
        else:
            unmatched.append("/".join(map(str, k)))
    if unmatched:
        # mirror the reference's lenient-load report (checkpoint.py:26-72
        # prints missing/unexpected keys) — silent random init hides e.g. a
        # num_fpn_levels mismatch between checkpoint and model
        print(f"restore_params: {len(unmatched)} param(s) not found in "
              f"checkpoint (left at template init): "
              f"{', '.join(unmatched[:8])}"
              f"{' ...' if len(unmatched) > 8 else ''}")
    return flax.traverse_util.unflatten_dict(flat_t)


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
