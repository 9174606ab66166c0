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


def hybrid_mesh(
    ici_shape: Tuple[int, ...],
    axes: Tuple[str, ...] = ("data", "model"),
    dcn_data_parallelism: Optional[int] = None,
) -> Mesh:
    """Multi-slice mesh: pure data parallelism over DCN (the slow
    slice-to-slice network), everything else — tensor/FSDP axes — inside a
    slice over ICI.

    This encodes the standard TPU-pod layout rule: collectives that move
    weights or activations (all-gather/reduce-scatter of TP and FSDP) must
    ride ICI; only the once-per-step gradient psum crosses DCN. ``axes[0]``
    is the DCN-side data axis; ``ici_shape`` gives the per-slice extent of
    the remaining axes (its leading entry, if any, multiplies the data axis
    within the slice).

    Single-slice (or CPU-mesh test) topologies fall back to ``make_mesh``
    with the same overall shape, so code written against the hybrid layout
    runs unchanged on one slice.
    """
    devices = jax.devices()
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    n_slices = len(slice_ids)
    dcn_dp = dcn_data_parallelism if dcn_data_parallelism is not None else n_slices
    if n_slices <= 1 or dcn_dp <= 1:
        return make_mesh((-1,) + tuple(ici_shape[1:]) if len(ici_shape) > 1
                         else (-1,), axes)
    from jax.experimental import mesh_utils

    dcn_parallelism = [dcn_dp] + [1] * (len(ici_shape) - 1)
    arr = mesh_utils.create_hybrid_device_mesh(
        tuple(ici_shape), tuple(dcn_parallelism), devices=devices
    )
    return Mesh(arr, axes)
