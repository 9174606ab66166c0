"""Typed configuration shared by pretraining and downstream phases.

Replaces the reference's two config systems (argparse+YAML in
pretraining/pretrain_mmae.py:75-185 and mmcv Config + fvcore CfgNode in
downstream/*/configs/config.py:48-154) with one dataclass tree that can be
loaded from / dumped to YAML.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Encoder hyper-parameters (reference multimae_crossattn.py:548-599)."""

    dim_tokens: int = 192
    depth: int = 12
    dim_head: int = 64
    heads: int = 3
    ff_mult: int = 4
    num_fusion_tokens: int = 256
    drop_path_rate: float = 0.0
    # 'crossattn' = per-layer fusion blocks (flagship, multimae_crossattn.py)
    # 'zorro'     = plain zorro-masked blocks only (multimae.py)
    # 'lstm'      = BiLSTM per-position fusion (multimae_lstm.py)
    # 'crossattn_v1' = dated 20231203 snapshot: gathered fusion stream +
    #               per-layer cross-attention over mask-embedded modality
    #               grids (multimae_crossattn_20231203.py)
    # 'sup'       = supervised baseline, no fusion stream (multimae_sup.py)
    fusion_mode: str = "crossattn"
    attn_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    # fusion-block KV-grid assembly: 'onehot' (all-matmul, default) |
    # 'gather' (gather-fwd / matmul-bwd custom VJP, ops/assemble.py).
    # Bit-identical numerics; gather measured SLOWER on v5e-1 (62.6 vs
    # 58.5 ms/step — see ops/assemble.py), kept for ablation
    kv_assembly: str = "onehot"


@dataclass(frozen=True)
class DataConfig:
    input_size: int = 256
    patch_size: int = 16
    in_domains: Tuple[str, ...] = ("s1", "s2", "dem")
    out_domains: Tuple[str, ...] = ("s1", "s2", "dem")
    data_path: str = ""
    batch_size: int = 60  # per replica, reference pretrain_mmae.py:79

    @property
    def num_patches(self) -> int:
        n = self.input_size // self.patch_size
        return n * n


@dataclass(frozen=True)
class MaskConfig:
    """Dirichlet token-budget masking (reference multimae_crossattn.py:205-278)."""

    num_encoded_tokens: int = 384
    alphas: float = 1.0
    sample_tasks_uniformly: bool = False


@dataclass(frozen=True)
class DecoderConfig:
    """Reconstruction decoder (reference output_adapters_simple.py:33-188)."""

    dim: int = 256
    depth: int = 2
    num_heads: int = 8
    use_task_queries: bool = True
    use_xattn: bool = True
    style: str = "simple"  # 'simple' | 'full' (output_adapters{_simple,}.py)
    # batch the task-generic decoder trunk across tasks (stacked params +
    # vmap); identical math + checkpoint layout. Measured SLOWER on v5e-1
    # (64.8 vs 61.5 ms/step: XLA overlaps the two sequential task chains
    # better than one vmapped chain), so off by default — kept as an option
    # for configs with many output tasks.
    batch_tasks: bool = False


@dataclass(frozen=True)
class OptimConfig:
    opt: str = "adamw"
    blr: float = 1e-4  # absolute lr = blr * total_batch / 256 (pretrain_mmae.py:335)
    warmup_lr: float = 1e-6
    min_lr: float = 0.0
    warmup_epochs: int = 40
    weight_decay: float = 0.05
    weight_decay_end: Optional[float] = None
    opt_betas: Tuple[float, float] = (0.9, 0.95)
    opt_eps: float = 1e-8
    clip_grad: Optional[float] = None
    skip_grad: Optional[float] = None
    task_balancer: str = "none"  # 'none' | 'uncertainty'
    balancer_lr_scale: float = 1.0
    # fused flat-vector AdamW (train/optim.py flat_adamw): numerically
    # identical to the optax chain, one big elementwise pass instead of
    # per-leaf fusion soup
    fused_adamw: bool = True


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 800
    save_ckpt_freq: int = 20
    seed: int = 0
    output_dir: str = "./save_attention"
    contra_weight: float = 0.3  # pretrain_mmae.py:500
    loss_on_unmasked: bool = False
    compute_dtype: str = "bfloat16"  # TPU-native AMP; 'float32' for parity tests
    # patch-layout reconstruction losses (losses/masked.py *_patch): skips
    # pred unpatchify / norm-pix transpose-back / pixel mask upsample.
    # Numerically identical (tests/test_losses_patch.py); False = the
    # pixel-space path, kept for ablation timing
    patch_space_losses: bool = True
    use_ema: bool = False  # model EMA (reference model_ema.py, unwired there)
    ema_decay: float = 0.9999
    # mesh axes: data parallel is the reference's only parallelism (SURVEY §2.4)
    mesh_shape: Tuple[int, ...] = (-1,)
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclass(frozen=True)
class PretrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mask: MaskConfig = field(default_factory=MaskConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# ---------------------------------------------------------------------------
# Named model sizes (reference multimae_crossattn.py:548-599)
# ---------------------------------------------------------------------------
MODEL_SIZES: Dict[str, ModelConfig] = {
    "tiny": ModelConfig(dim_tokens=192, depth=12, dim_head=64, heads=3),
    "base": ModelConfig(dim_tokens=768, depth=12, dim_head=64, heads=8),
    "large": ModelConfig(dim_tokens=1024, depth=24, dim_head=64, heads=8),
    # TPU-native geometry (round 5): NOT checkpoint-compatible with the
    # reference's tiny (whose dh=64 halves the MXU contraction width — the
    # round-4 roofline's one far-off-peak kernel). dh=128 makes every head
    # slice a full lane tile and every attention contraction a full MXU
    # pass; dim 256 keeps all projections 128-multiple. Same depth/loss/
    # capability surface — this is the geometry a from-scratch TPU user
    # should pretrain with (tools/bench_native_geometry.py measures it).
    "tiny_tpu": ModelConfig(dim_tokens=256, depth=12, dim_head=128, heads=2),
    # base-class TPU-native geometry: the reference's base (768d, 8x64,
    # multimae_crossattn.py:588-599) re-headed to 6x128 — full-lane head
    # slices, 6-tile (768-deep) MXU contractions on every projection.
    "base_tpu": ModelConfig(dim_tokens=768, depth=12, dim_head=128, heads=6),
}


def _to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: _to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, tuple):
        return list(cfg)
    return cfg


def _from_dict(cls, d: Dict[str, Any]):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, type) and dataclasses.is_dataclass(f.type)
        ):
            v = _from_dict(f.type, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def to_yaml(cfg: PretrainConfig) -> str:
    import yaml

    return yaml.safe_dump(_to_dict(cfg), sort_keys=False)


def from_yaml(text: str) -> PretrainConfig:
    import yaml

    d = yaml.safe_load(text) or {}
    sub = {
        "model": ModelConfig,
        "data": DataConfig,
        "mask": MaskConfig,
        "decoder": DecoderConfig,
        "optim": OptimConfig,
        "train": TrainConfig,
    }
    kwargs = {k: _from_dict(cls, d[k]) for k, cls in sub.items() if k in d}
    return PretrainConfig(**kwargs)
