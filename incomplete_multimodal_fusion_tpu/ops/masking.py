"""Dirichlet token-budget masking engine with static shapes.

Re-implements the reference's ``generate_random_masks``
(pretraining/multimae/multimae_crossattn.py:205-278) as pure JAX functions.

The reference then gathers visible tokens with data-dependent ``nonzero``
indexing (multimae_crossattn.py:402-415), which would force one XLA
recompilation per mask pattern. Here every forward uses a fixed-size packed
layout of exactly ``num_encoded_tokens`` slots:

  * ``order``       [B, N]  permutation putting visible tokens first,
                            in ascending global-index order (i.e. grouped by
                            modality, matching the reference's cat order).
  * ``num_visible`` [B]     how many packed slots are real; slots >= this are
                            padding, excluded everywhere via masks.
  * ``task_masks``  {task: [B, N_t]} 1 = masked, 0 = visible (reference
                            convention, used by the losses and Block_Fusion).

Masks are batch-shared by default, exactly like the reference (its mask is
computed once and ``.repeat(B, 1)``-ed, multimae_crossattn.py:276-278).
"""
from __future__ import annotations

import itertools
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class MaskInfo(NamedTuple):
    task_masks: Dict[str, jnp.ndarray]  # {task: [B, N_t]} int32, 1=masked
    order: jnp.ndarray  # [B, N] int32; order[:, :E] indexes visible tokens
    ids_restore: jnp.ndarray  # [B, N] int32, inverse of order
    num_visible: jnp.ndarray  # [B] int32, <= num_encoded_tokens


def _single_random_mask(
    key: jax.Array,
    num_tokens_per_task: Sequence[int],
    num_encoded_tokens: int,
    alphas,
    sample_tasks_uniformly: bool,
) -> jnp.ndarray:
    """One [N] 0/1 mask with exactly num_encoded_tokens zeros."""
    n_tasks = len(num_tokens_per_task)
    total = int(sum(num_tokens_per_task))
    alphas_arr = jnp.full((n_tasks,), alphas, dtype=jnp.float32) if jnp.ndim(alphas) == 0 else jnp.asarray(alphas, jnp.float32)

    k_dir, k_combo, k_fix = jax.random.split(key, 3)
    if sample_tasks_uniformly:
        # reference sample_alphas (multimae_crossattn.py:188-203): pick a
        # non-empty task subset uniformly, Dirichlet over the chosen subset.
        combos = jnp.asarray(
            [list(c) for c in itertools.product([0, 1], repeat=n_tasks)][1:],
            dtype=jnp.float32,
        )
        idx = jax.random.randint(k_combo, (), 0, combos.shape[0])
        alphas_arr = combos[idx] * alphas_arr + 1e-5
    dist = jax.random.dirichlet(k_dir, alphas_arr)  # [T]
    samples_per_task = jnp.round(dist * num_encoded_tokens).astype(jnp.int32)

    # Per-task random keep of samples_per_task[t] tokens
    # (multimae_crossattn.py:236-247): shuffle arange, keep where < budget.
    keys = jax.random.split(k_fix, n_tasks + 1)
    parts = []
    for t, n_t in enumerate(num_tokens_per_task):
        noise = jax.random.uniform(keys[t], (n_t,))
        shuffled_pos = jnp.argsort(jnp.argsort(noise))  # rank of each token
        parts.append(jnp.where(shuffled_pos < samples_per_task[t], 0, 1))
    mask_all = jnp.concatenate(parts).astype(jnp.int32)  # [N]

    # Adjust to exactly E visible tokens (multimae_crossattn.py:264-272):
    # random within {visible, masked} groups, first E become visible.
    tie = jax.random.uniform(keys[-1], (total,))
    ids_shuffle = jnp.argsort(mask_all.astype(jnp.float32) + tie)
    ids_restore = jnp.argsort(ids_shuffle)
    flags = (jnp.arange(total) >= num_encoded_tokens).astype(jnp.int32)
    return jnp.take(flags, ids_restore)  # exact-E 0/1 mask


def generate_random_masks(
    key: jax.Array,
    task_names: Tuple[str, ...],
    num_tokens_per_task: Tuple[int, ...],
    num_encoded_tokens: int,
    batch_size: int,
    alphas=1.0,
    sample_tasks_uniformly: bool = False,
    batch_shared: bool = True,
) -> MaskInfo:
    """Dirichlet task-budget masks, exactly ``num_encoded_tokens`` visible."""
    if batch_shared:
        mask = _single_random_mask(
            key, num_tokens_per_task, num_encoded_tokens, alphas, sample_tasks_uniformly
        )
        mask = jnp.broadcast_to(mask, (batch_size, mask.shape[0]))
    else:
        keys = jax.random.split(key, batch_size)
        mask = jax.vmap(
            lambda k: _single_random_mask(
                k, num_tokens_per_task, num_encoded_tokens, alphas, sample_tasks_uniformly
            )
        )(keys)
    return mask_info_from_flat_mask(mask, task_names, num_tokens_per_task, num_encoded_tokens)


def mask_info_from_flat_mask(
    mask_all: jnp.ndarray,
    task_names: Tuple[str, ...],
    num_tokens_per_task: Tuple[int, ...],
    num_encoded_tokens: int,
) -> MaskInfo:
    """Build packed-layout bookkeeping from a [B, N] 0/1 mask."""
    b, n = mask_all.shape
    # Deterministic packing: visible first, ascending global index (grouped by
    # modality like the reference's torch.cat of per-modality visible tokens).
    sort_key = mask_all.astype(jnp.int32) * n + jnp.arange(n, dtype=jnp.int32)[None, :]
    order = jnp.argsort(sort_key, axis=1).astype(jnp.int32)
    ids_restore = jnp.argsort(order, axis=1).astype(jnp.int32)
    num_visible = jnp.minimum(
        jnp.sum(mask_all == 0, axis=1).astype(jnp.int32), num_encoded_tokens
    )
    splits = []
    start = 0
    for n_t in num_tokens_per_task:
        splits.append(mask_all[:, start : start + n_t].astype(jnp.int32))
        start += n_t
    task_masks = dict(zip(task_names, splits))
    return MaskInfo(task_masks, order, ids_restore, num_visible)


def mask_info_from_task_masks(
    task_masks: Dict[str, jnp.ndarray],
    task_names: Tuple[str, ...],
    num_encoded_tokens: int,
) -> MaskInfo:
    """User-supplied masks path (reference forward branch
    multimae_crossattn.py:395-399; used for modality ablation at inference,
    infer_mmae.py:344-361: fill a task's mask with 1 to drop the modality).

    Works with any number of visible tokens <= num_encoded_tokens without
    recompiling: extra packed slots become padding.
    """
    mask_all = jnp.concatenate([task_masks[t] for t in task_names], axis=1)
    nums = tuple(task_masks[t].shape[1] for t in task_names)
    return mask_info_from_flat_mask(mask_all, task_names, nums, num_encoded_tokens)


def _single_incomplete_mask(
    key: jax.Array,
    num_tokens_per_task: Sequence[int],
    present: jnp.ndarray,  # [T] float
    keep_ratio: float,
    alphas: float,
) -> jnp.ndarray:
    """One [N] 0/1 keep-mask over the present modalities."""
    n_tasks = len(num_tokens_per_task)
    total = int(sum(num_tokens_per_task))
    k_dir, k_tok, k_fix = jax.random.split(key, 3)

    alphas_vec = jnp.full((n_tasks,), alphas, jnp.float32) * present + 1e-6
    dist = jax.random.dirichlet(k_dir, alphas_vec) * present
    dist = dist / jnp.maximum(dist.sum(), 1e-6)
    nums = jnp.asarray(num_tokens_per_task, jnp.float32)
    e_dyn = jnp.floor(keep_ratio * jnp.sum(nums * present)).astype(jnp.int32)
    samples = jnp.round(dist * e_dyn).astype(jnp.int32)

    keys = jax.random.split(k_tok, n_tasks)
    parts = []
    absent_parts = []
    for t, n_t in enumerate(num_tokens_per_task):
        noise = jax.random.uniform(keys[t], (n_t,))
        rank = jnp.argsort(jnp.argsort(noise))
        keep = (rank < samples[t]) & (present[t] > 0)
        parts.append(jnp.where(keep, 0, 1))
        absent_parts.append(jnp.full((n_t,), 1.0 - present[t]))
    mask_all = jnp.concatenate(parts).astype(jnp.int32)
    absent = jnp.concatenate(absent_parts)

    # exact-count fix; absent tokens sort last so they are never promoted
    tie = jax.random.uniform(k_fix, (total,))
    ids_shuffle = jnp.argsort(mask_all.astype(jnp.float32) + 10.0 * absent + tie)
    ids_restore = jnp.argsort(ids_shuffle)
    flags = (jnp.arange(total) >= e_dyn).astype(jnp.int32)
    return jnp.take(flags, ids_restore)


def incomplete_random_masks(
    key: jax.Array,
    task_names: Tuple[str, ...],
    num_tokens_per_task: Tuple[int, ...],
    present: jnp.ndarray,  # [T] bool — modalities available this step
    num_encoded_tokens: int,  # static packing size (>= max possible visible)
    batch_size: int,
    keep_ratio: float = 0.9,
    alphas: float = 1.0,
    batch_shared: bool = True,
) -> MaskInfo:
    """Downstream train-time masking (multimae_big_imcomplete.py:542-594):
    a random modality subset is chosen per step (`present`, sampled OUTSIDE
    jit or via `sample_modality_subset`), then keep_ratio of the present
    tokens stay visible via Dirichlet budgeting. Absent modalities are fully
    masked; the packed layout pads up to the static num_encoded_tokens.

    ``batch_shared=True`` mirrors the reference quirk (one keep-mask for the
    whole batch, like multimae_crossattn.py:276-278); ``False`` samples an
    independent keep-mask per sample (the modality subset stays per-step —
    the reference samples it in python once per batch, :542-548).
    """
    present = present.astype(jnp.float32)
    if batch_shared:
        mask = _single_incomplete_mask(
            key, num_tokens_per_task, present, keep_ratio, alphas
        )
        mask = jnp.broadcast_to(mask, (batch_size, mask.shape[0]))
    else:
        keys = jax.random.split(key, batch_size)
        mask = jax.vmap(
            lambda k: _single_incomplete_mask(
                k, num_tokens_per_task, present, keep_ratio, alphas
            )
        )(keys)
    return mask_info_from_flat_mask(
        mask, task_names, num_tokens_per_task, num_encoded_tokens
    )


def sample_modality_subset(key: jax.Array, n_tasks: int) -> jnp.ndarray:
    """random.randint(1, T); random.sample(domains, k)
    (multimae_big_imcomplete.py:542-548) as a [T] bool vector."""
    k1, k2 = jax.random.split(key)
    k = jax.random.randint(k1, (), 1, n_tasks + 1)
    rank = jnp.argsort(jax.random.uniform(k2, (n_tasks,)))
    rank = jnp.argsort(rank)
    return rank < k


def full_visible_mask_info(
    task_names: Tuple[str, ...],
    num_tokens_per_task: Tuple[int, ...],
    batch_size: int,
) -> MaskInfo:
    """No masking: every token visible (mask_inputs=False path,
    multimae_crossattn.py:384-385). num_encoded_tokens == N_total."""
    total = int(sum(num_tokens_per_task))
    masks = {
        t: jnp.zeros((batch_size, n), jnp.int32)
        for t, n in zip(task_names, num_tokens_per_task)
    }
    return mask_info_from_task_masks(masks, task_names, total)


def make_mask(
    n_h: int,
    n_w: int,
    xy_idxs: Dict[str, Sequence[Tuple[int, int]]],
    full_tasks: Sequence[str] = (),
    indicate_visible: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Build per-task masks from (x, y) visible-coordinate lists
    (reference make_mask, multimae_crossattn.py:280-308)."""
    import numpy as np

    task_masks = {}
    for k, coords in xy_idxs.items():
        m = np.ones((n_h, n_w), dtype=np.int32)
        for (x, y) in coords:
            m[y, x] = 0
        task_masks[k] = m
    for task in full_tasks:
        task_masks[task][:] = 0
    if not indicate_visible:
        task_masks = {k: 1 - v for k, v in task_masks.items()}
    return {k: jnp.asarray(v.reshape(1, -1)) for k, v in task_masks.items()}
