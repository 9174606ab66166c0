"""Shared helpers for the Pallas kernel suite (attn / ffn / msda / points)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interpret_mode() -> bool:
    """Pallas kernels compile only for TPU; everywhere else (CPU tests, the
    driver's virtual-device dryrun) they run interpreted. Callers that can
    be lowered for a CPU device from a TPU-default-backend process must ALSO
    gate dispatch with jax.lax.platform_dependent — this flag alone reflects
    the default backend, not the lowering target."""
    return jax.default_backend() != "tpu"


def hat(coord, idx):
    """Separable bilinear hat weight max(0, 1 - |coord - idx|): the 4-corner
    grid_sample(align_corners=False) weights emerge from the product of a
    y-hat and an x-hat, with zero padding past the border for free."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord - idx))


def dhat(coord, idx):
    """d(hat)/d(coord): -sign(coord - idx) on the open support |.| < 1."""
    diff = coord - idx
    return jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)
