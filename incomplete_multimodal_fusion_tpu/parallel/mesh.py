"""Device-mesh construction.

TPU-native replacement for the reference's DDP/NCCL bring-up
(pretraining/utils/dist.py:62-93): a single SPMD program over a
``jax.sharding.Mesh``; rank discovery, process groups and barriers disappear
— XLA collectives over ICI replace NCCL all-reduce.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    shape: Tuple[int, ...] = (-1,),
    axes: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh; a single -1 dim absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def data_parallel_mesh() -> Mesh:
    return make_mesh((-1,), ("data",))
