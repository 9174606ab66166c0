"""Activation statistics capture (reference pretraining/utils/model.py:30-106
``ActivationStatsHook``: register hooks on matching modules, log per-layer
stats). Flax-functional equivalent via ``capture_intermediates``.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp


def default_stats(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Mirrors the reference's avg-channel-norm style hook."""
    xf = x.astype(jnp.float32)
    return {
        "mean": xf.mean(),
        "std": xf.std(),
        "absmax": jnp.abs(xf).max(),
    }


def collect_activation_stats(
    model,
    variables: Dict,
    *args,
    filter_regex: str = ".*",
    stat_fn: Callable = default_stats,
    **kwargs,
) -> Dict[str, Dict[str, float]]:
    """Run a forward pass capturing every module output whose path matches
    ``filter_regex``; returns {module_path: {stat: value}}."""
    pattern = re.compile(filter_regex)
    _, state = model.apply(
        variables, *args, capture_intermediates=True, mutable=["intermediates"],
        **kwargs,
    )
    flat = {}

    def visit(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, tuple):
            for i, v in enumerate(tree):
                visit(v, prefix)
        elif isinstance(tree, jnp.ndarray):
            if pattern.search(prefix):
                flat[prefix] = {k: float(v) for k, v in stat_fn(tree).items()}

    visit(state["intermediates"])
    return flat
