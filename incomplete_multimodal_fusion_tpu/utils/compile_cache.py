"""Persistent XLA compilation cache shared by every tool and script.

Compiles through the tunneled axon backend cost minutes each; the persistent
cache (keyed on HLO + compile options, stored under the repo root) makes
every tool after the first run of a given program shape start in seconds.
bench.py pioneered this for the driver's budgeted run (round-4 verdict
Do#3); tools/* route through here so kernel A/Bs, rooflines, and the
geometry/serving/quadruplet benches amortize the same cache.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at <repo>/.jax_compile_cache
    (or ``cache_dir``). Safe to call before or after backend init; a no-op
    on JAX builds without the config knobs."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_compile_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or unsupported backend: compile as before
