"""Multi-host helpers (reference pretraining/utils/dist.py:18-159).

The reference's rank bootstrap (OMPI/SLURM env parsing + NCCL process groups,
dist.py:62-93) collapses to ``jax.distributed.initialize()``; the
file-system-based ``collect_results_cpu`` gather (dist.py:96-159) becomes
``multihost_utils.process_allgather``; rank-0 print gating survives as
``is_main_process`` / ``print_main``.
"""
from __future__ import annotations

import builtins
from typing import Any, Optional

import jax


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> None:
    """Multi-host bring-up. No-op on a single host (like the reference's
    'Not using distributed mode' branch, dist.py:80-84)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def print_main(*args, **kwargs) -> None:
    """Rank-0-only print (setup_for_distributed, dist.py:18-30)."""
    if is_main_process():
        builtins.print(*args, **kwargs)


def collect_results(local: Any) -> Any:
    """All-gather host-local results across processes
    (collect_results_cpu equivalent, dist.py:96-159)."""
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(local)


def save_on_master(save_fn, *args, **kwargs) -> None:
    """Rank-0-gated save (dist.py:56-59). Note orbax checkpointing is already
    multihost-coordinated; use this only for ad-hoc artifacts."""
    if is_main_process():
        save_fn(*args, **kwargs)
