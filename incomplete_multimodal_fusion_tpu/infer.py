"""MAE inference / reconstruction preview (reference pretraining/infer_mmae.py).

Public API behavior mirrored:
  * single-tile forward with a fixed RNG and ``num_encoded_tokens``
    (infer_mmae.py:330-338);
  * caller-supplied ``task_masks`` to force modalities absent
    (infer_mmae.py:344-361: "fill 1 = drop a modality") — here the
    ``drop_modalities`` convenience wraps it;
  * masked-input / prediction / ground-truth grids (infer_mmae.py:233-287),
    written with matplotlib when available.

Also provides PSNR, the parity metric named in BASELINE.md.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import masking


class InferenceResult(NamedTuple):
    preds: Dict[str, jnp.ndarray]  # {task: [B, H, W, C]}
    task_masks: Dict[str, jnp.ndarray]  # {task: [B, N]} 1 = masked
    pooled: jnp.ndarray  # [B, T+1, D]


def infer(
    model,
    params,
    x: Dict[str, jnp.ndarray],
    num_encoded_tokens: int,
    rng: Optional[jax.Array] = None,
    task_masks: Optional[Dict[str, jnp.ndarray]] = None,
    drop_modalities: Sequence[str] = (),
    alphas: float = 1.0,
    sample_tasks_uniformly: bool = False,
) -> InferenceResult:
    """Forward pass with random masking (default) or explicit/ablation masks."""
    domains = tuple(model.in_domains)
    b = x[domains[0]].shape[0]
    n = model.num_patches
    unknown = set(drop_modalities) - set(domains)
    if unknown:
        raise ValueError(f"drop_modalities {sorted(unknown)} not in model domains {domains}")
    if task_masks is None and drop_modalities:
        task_masks = {
            d: jnp.full((b, n), 1 if d in drop_modalities else 0, jnp.int32)
            for d in domains
        }
    if task_masks is not None:
        # pack at FULL capacity: with caller-supplied masks the visible count
        # can exceed num_encoded_tokens (e.g. dropping 1 of 3 modalities
        # leaves 512 visible tokens); the reference encodes all of them
        # (multimae_crossattn.py:399). Padding slots handle the rest.
        num_encoded_tokens = n * len(domains)
        mi = masking.mask_info_from_task_masks(task_masks, domains, num_encoded_tokens)
    else:
        rng = rng if rng is not None else jax.random.PRNGKey(1)  # infer_mmae.py:330 seed(1)
        mi = masking.generate_random_masks(
            rng, domains, (n,) * len(domains), num_encoded_tokens, b,
            alphas=alphas, sample_tasks_uniformly=sample_tasks_uniformly,
        )
    out = model.apply({"params": params}, x, mi, num_encoded_tokens)
    return InferenceResult(out["preds"], out["task_masks"], out["pooled"])


def masked_input(x: jnp.ndarray, mask: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Zero out masked patches for visualization (infer_mmae plot grids)."""
    b, h, w, c = x.shape
    nh, nw = h // patch_size, w // patch_size
    m = mask.reshape(b, nh, nw).astype(x.dtype)
    m = jnp.repeat(jnp.repeat(m, patch_size, axis=1), patch_size, axis=2)
    return x * (1 - m)[..., None]


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: Optional[float] = None) -> jnp.ndarray:
    """Peak signal-to-noise ratio (BASELINE.md reconstruction-parity metric)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if data_range is None:
        data_range = float(jnp.max(target) - jnp.min(target))
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def masked_psnr(pred, target, mask, patch_size: int, data_range: Optional[float] = None):
    """PSNR over masked (reconstructed) patches only."""
    b, h, w, c = pred.shape
    nh, nw = h // patch_size, w // patch_size
    m = mask.reshape(b, nh, nw).astype(jnp.float32)
    m = jnp.repeat(jnp.repeat(m, patch_size, axis=1), patch_size, axis=2)[..., None]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if data_range is None:
        data_range = float(jnp.max(target) - jnp.min(target))
    mse = jnp.sum(((pred - target) ** 2) * m) / jnp.maximum(jnp.sum(m) * c, 1.0)
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def plot_reconstructions(
    x: Dict[str, np.ndarray],
    result: InferenceResult,
    patch_size: int,
    out_path: str = "output.jpg",
    denorm: Optional[Dict[str, Tuple[float, float]]] = None,
):
    """Masked-input / prediction / GT grid per modality -> image file
    (infer_mmae.py:233-287). Requires matplotlib (gated)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("matplotlib not available for plotting") from e

    domains = list(result.preds.keys())
    fig, axes = plt.subplots(len(domains), 3, figsize=(9, 3 * len(domains)))
    if len(domains) == 1:
        axes = axes[None, :]

    def denormalize(img, d):
        if denorm and d in denorm:
            mu, sigma = denorm[d]
            return img * sigma + mu
        return img

    for i, d in enumerate(domains):
        gt = np.asarray(x[d][0])
        pred = np.asarray(result.preds[d][0])
        mask = np.asarray(result.task_masks[d][:1])
        if gt.ndim == 2:  # semseg modality (e.g. dnw): int class map
            pred = np.argmax(pred, axis=-1).astype(np.float32)[..., None]
            gt = gt.astype(np.float32)[..., None]
            masked = np.asarray(
                masked_input(jnp.asarray(gt)[None], jnp.asarray(mask), patch_size)
            )[0]
        else:
            masked = np.asarray(
                masked_input(jnp.asarray(x[d][:1]), jnp.asarray(mask), patch_size)
            )[0]
        for j, (img, title) in enumerate(
            [(masked, f"{d} masked"), (pred, f"{d} pred"), (gt, f"{d} gt")]
        ):
            img = denormalize(img, d)
            if img.shape[-1] == 3:
                lo, hi = img.min(), img.max()
                axes[i, j].imshow((img - lo) / max(hi - lo, 1e-6))
            elif img.shape[-1] == 4:  # e.g. S2 HR bands: render first 3
                rgb = img[..., :3]
                lo, hi = rgb.min(), rgb.max()
                axes[i, j].imshow((rgb - lo) / max(hi - lo, 1e-6))
            else:  # 1, 2 or >4 channels: render channel 0 with a colormap
                axes[i, j].imshow(img[..., 0], cmap="viridis")
            axes[i, j].set_title(title)
            axes[i, j].axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
