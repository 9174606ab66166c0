"""incomplete_multimodal_fusion_tpu: TPU-native incomplete multimodal fusion framework.

A JAX/XLA/Pallas re-design of the capabilities of
Yusin2Chen/incomplete_multimodal_fusion (PyTorch/CUDA): a MultiMAE-style
multi-modal masked autoencoder with learned fusion tokens, modality-typed
(Zorro-style) masked self-attention and per-layer cross-modal fusion blocks,
trained with random modality combinations, plus Mask2Former-style downstream
segmentation heads.

Design stance (TPU-first, not a port):
  * Static-shape packed token layout + mask tensors instead of ragged gathers
    (reference: multimae_crossattn.py:402-415 uses data-dependent `nonzero`)
    so arbitrary modality-dropout masks never trigger recompilation.
  * One core library instead of the reference's three mirrored trees.
  * pjit/shard_map over a `jax.sharding.Mesh` replaces DDP/NCCL.
  * Pallas kernels for the hot ops (zorro-masked attention, multi-scale
    deformable attention) replace the vendored C++/CUDA extension.
"""

__version__ = "0.1.0"

from . import config, modalities, ops, models, losses, train

__all__ = ["config", "modalities", "ops", "models", "losses", "train", "__version__"]
