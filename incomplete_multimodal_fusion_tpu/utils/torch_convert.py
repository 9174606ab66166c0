"""Transplant reference PyTorch MultiMAE checkpoints into flax params.

Maps the state dict of the reference flagship
(pretraining/multimae/multimae_crossattn.py — crossattn fusion, the
pretrain_mmae.py path) onto this framework's ``models.multimae.MultiMAE``
parameter tree. Works on plain ``{name: np.ndarray}`` dicts so torch is NOT
required at runtime: save ``{k: v.numpy() for k, v in sd.items()}`` once and
convert anywhere.

Layout translations (torch -> flax/TPU):
  * ``nn.Linear`` weight [out, in]         -> Dense kernel [in, out]
  * patchify ``nn.Conv2d`` [D, C, P, P]    -> matmul kernel [(ph pw c), D]
    (input_adapters.py:88-91 vs ops/patches.conv_patch_embed)
  * decoder ``out_proj`` rows in (c ph pw) -> cols in (ph pw c)
    (output_adapters_simple.py:184-188 'b (nh nw) (c ph pw)' vs NHWC
    unpatchify's '(p1 p2 c)')
  * fixed sin-cos pos_emb buffers are NOT transplanted — recomputed
    (golden-tested bit-equal, tests/test_reference_parity.py)
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

__all__ = [
    "convert_multimae_state", "convert_vit_baseline_state",
    "convert_pixel_decoder_state", "convert_mask2former_decoder_state",
    "convert_maskformer_state", "strip_prefixes",
]


def strip_prefixes(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DDP 'module.' wrappers (reference misc.py:147-171
    load_parallal_model role)."""
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v)
    return out


def _lin(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv_patch_kernel(w: np.ndarray) -> np.ndarray:
    """[D, C, P, P] conv weight -> [(ph pw c), D] matmul kernel."""
    d, c, ph, pw = w.shape
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(ph * pw * c, d))


def _out_proj(w: np.ndarray, b: np.ndarray, c: int, p: int):
    """out_proj Linear [(c ph pw), dim] -> kernel [dim, (ph pw c)] + bias."""
    dim = w.shape[1]
    k = w.reshape(c, p, p, dim).transpose(1, 2, 0, 3).reshape(p * p * c, dim)
    bias = b.reshape(c, p, p).transpose(1, 2, 0).reshape(-1)
    return np.ascontiguousarray(k.T), np.ascontiguousarray(bias)


def _zorro_attention(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """zorro_utils.Attention (norm + bias-free to_q/to_kv/to_out)."""
    return {
        "norm": {"gamma": s[f"{p}.norm.gamma"]},
        "to_q": {"kernel": _lin(s[f"{p}.to_q.weight"])},
        "to_kv": {"kernel": _lin(s[f"{p}.to_kv.weight"])},
        "to_out": {"kernel": _lin(s[f"{p}.to_out.weight"])},
    }


def _geglu_ff(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """zorro_utils.FeedForward Sequential(LayerNorm, Linear, GEGLU, Linear)."""
    return {
        "norm": {"gamma": s[f"{p}.0.gamma"]},
        "proj_in": {"kernel": _lin(s[f"{p}.1.weight"])},
        "proj_out": {"kernel": _lin(s[f"{p}.3.weight"])},
    }


def _encoder_block(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """zorro_utils.Block -> models.layers.EncoderBlock."""
    return {
        "norm1": {"gamma": s[f"{p}.norm1.gamma"]},
        "attn": _zorro_attention(s, f"{p}.attn"),
        "norm2": {"gamma": s[f"{p}.norm2.gamma"]},
        "mlp": _geglu_ff(s, f"{p}.mlp"),
    }


def _fusion_block(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """zorro_utils.Block_Fusion -> models.layers.FusionBlock(Fast)
    (the attention is inlined there: attn_norm/to_q/to_kv/to_out at top)."""
    return {
        "norm1": {"gamma": s[f"{p}.norm1.gamma"]},
        "attn_norm": {"gamma": s[f"{p}.attn.norm.gamma"]},
        "to_q": {"kernel": _lin(s[f"{p}.attn.to_q.weight"])},
        "to_kv": {"kernel": _lin(s[f"{p}.attn.to_kv.weight"])},
        "to_out": {"kernel": _lin(s[f"{p}.attn.to_out.weight"])},
        "norm2": {"gamma": s[f"{p}.norm2.gamma"]},
        "mlp": _geglu_ff(s, f"{p}.mlp"),
    }


def _mlp(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """multimae_utils/zorro_utils Mlp (fc1/fc2 with biases)."""
    return {
        "fc1": {"kernel": _lin(s[f"{p}.fc1.weight"]), "bias": s[f"{p}.fc1.bias"]},
        "fc2": {"kernel": _lin(s[f"{p}.fc2.weight"]), "bias": s[f"{p}.fc2.bias"]},
    }


def _vit_block(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """multimae_utils.Block (standard ViT block, LayerNorm eps 1e-6 with
    bias, fused qkv) -> models.layers.ViTBlock."""
    out = {
        "norm1": {"gamma": s[f"{p}.norm1.weight"], "beta": s[f"{p}.norm1.bias"]},
        "attn": {
            "qkv": {"kernel": _lin(s[f"{p}.attn.qkv.weight"])},
            "proj": {"kernel": _lin(s[f"{p}.attn.proj.weight"]),
                     "bias": s[f"{p}.attn.proj.bias"]},
        },
        "norm2": {"gamma": s[f"{p}.norm2.weight"], "beta": s[f"{p}.norm2.bias"]},
        "mlp": _mlp(s, f"{p}.mlp"),
    }
    if f"{p}.attn.qkv.bias" in s:
        out["attn"]["qkv"]["bias"] = s[f"{p}.attn.qkv.bias"]
    return out


def _input_adapter(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """PatchedInputAdapter (conv patchify; input_adapters.py:27-119) or
    SemSegInputAdapter (class emb + conv; :209-328)."""
    out = {
        "proj_kernel": _conv_patch_kernel(s[f"{p}.proj.weight"]),
        "proj_bias": s[f"{p}.proj.bias"],
    }
    if f"{p}.class_emb.weight" in s:
        out["class_emb"] = s[f"{p}.class_emb.weight"]
    return out


def _output_adapter_simple(
    s: Mapping[str, np.ndarray], p: str, task: str, num_channels: int,
    patch: int, depth: int,
) -> Dict:
    """SpatialOutputAdapter (output_adapters_simple.py:33-188). Only this
    task's embedding is live in the forward (:178-181); the other context
    tasks' embeddings are created but never read — deliberately dropped."""
    out = {
        "proj_context": {
            "kernel": _lin(s[f"{p}.proj_context.weight"]),
            "bias": s[f"{p}.proj_context.bias"],
        },
        "task_emb": s[f"{p}.task_embeddings.{task}"],
    }
    for i in range(depth):
        out[f"block{i}"] = _vit_block(s, f"{p}.decoder_transformer.{i}")
    k, b = _out_proj(s[f"{p}.out_proj.weight"], s[f"{p}.out_proj.bias"],
                     num_channels, patch)
    out["out_proj"] = {"kernel": k, "bias": b}
    return out


def _snapshot_cross_attention(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """zorro_utils.CrossAttention (q/kv bias-free, proj with bias) ->
    models.layers.SnapshotCrossAttention."""
    return {
        "q": {"kernel": _lin(s[f"{p}.q.weight"])},
        "kv": {"kernel": _lin(s[f"{p}.kv.weight"])},
        "proj": {"kernel": _lin(s[f"{p}.proj.weight"]),
                 "bias": s[f"{p}.proj.bias"]},
    }


def convert_multimae_state(
    state: Mapping[str, np.ndarray],
    in_domains: Sequence[str],
    out_domains: Sequence[str],
    out_channels: Mapping[str, int],
    patch_size: int = 16,
    depth: int = 12,
    decoder_depth: int = 2,
    fusion_mode: str = "crossattn",
) -> Dict:
    """Reference MultiMAE state dict -> flax params tree for
    ``models.multimae.MultiMAE``.

    ``fusion_mode='crossattn'``: the flagship (multimae_crossattn.py) with
    per-layer Block_Fusion. ``fusion_mode='crossattn_v1'``: the 20231203
    snapshot (multimae_crossattn_20231203.py) — shared per-layer
    cross-attention + per-modality pool heads instead of fus_blocks.
    ``out_channels``: per out-domain reconstruction channel count (class
    count for semseg domains).
    """
    s = strip_prefixes(state)
    params: Dict = {
        "fusion_tokens": s["fusion_tokens"],
        "return_tokens": s["return_tokens"],
        "mask_embedding": s["mask_embedding"],
        "norm": {"gamma": s["norm.gamma"]},
        "attn_pool": _zorro_attention(s, "attn_pool"),
        "mlp": _mlp(s, "mlp"),
    }
    for d in in_domains:
        params[f"return_token_{d}"] = s[f"return_token_{d}"]
        params[f"input_adapter_{d}"] = _input_adapter(s, f"input_adapters.{d}")
    for i in range(depth):
        params[f"block{i}"] = _encoder_block(s, f"blocks.{i}")
        if fusion_mode == "crossattn":
            params[f"fus_block{i}"] = _fusion_block(s, f"fus_blocks.{i}")
    if fusion_mode == "crossattn_v1":
        params["attn_pool_modalities"] = _snapshot_cross_attention(
            s, "attn_pool_modalities")
        params["mlp_modalities"] = _mlp(s, "mlp_modalities")
        for d in in_domains:
            params[f"attn_{d}"] = _zorro_attention(s, f"attn_{d}")
            params[f"mlp_{d}"] = _mlp(s, f"mlp_{d}")
    for d in out_domains:
        params[f"output_adapter_{d}"] = _output_adapter_simple(
            s, f"output_adapters.{d}", d, out_channels[d], patch_size,
            decoder_depth,
        )
    return params


# ---------------------------------------------------------------------------
# Downstream (MaskFormer) converters. Each mapping is pinned by a transplant
# golden test against the executed reference: tests/test_vit_baseline_parity
# .py, tests/test_pixel_decoder_parity.py, tests/test_mask2former_decoder_
# parity.py.
# ---------------------------------------------------------------------------

def _convt(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out],
    SPATIALLY FLIPPED: torch scatters weight[i, j] to output[p*s+i, q*s+j];
    flax/lax.conv_transpose evaluates a fractionally-strided conv with the
    unflipped kernel — for stride == kernel the two differ by a flip."""
    return {
        "kernel": np.ascontiguousarray(
            s[f"{p}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]),
        "bias": s[f"{p}.bias"],
    }


def _conv2d(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """torch Conv2d [O, I, kh, kw] -> flax Conv [kh, kw, I, O]."""
    return {"kernel": np.ascontiguousarray(s[f"{p}.weight"].transpose(2, 3, 1, 0)),
            "bias": s[f"{p}.bias"]}


def _conv1x1_dense(s: Mapping[str, np.ndarray], p: str) -> Dict:
    """torch 1x1 Conv2d -> flax Dense on the flattened map."""
    return {"kernel": _lin(s[f"{p}.weight"][:, :, 0, 0]), "bias": s[f"{p}.bias"]}


def _linear(s: Mapping[str, np.ndarray], p: str) -> Dict:
    return {"kernel": _lin(s[f"{p}.weight"]), "bias": s[f"{p}.bias"]}


def _ln(s: Mapping[str, np.ndarray], p: str) -> Dict:
    return {"scale": s[f"{p}.weight"], "bias": s[f"{p}.bias"]}


def _torch_mha(s: Mapping[str, np.ndarray], p: str, d: int) -> Dict:
    """torch nn.MultiheadAttention (packed in_proj) -> models MHA module."""
    inw, inb = s[f"{p}.in_proj_weight"], s[f"{p}.in_proj_bias"]
    return {
        "q_proj": {"kernel": _lin(inw[:d]), "bias": inb[:d]},
        "k_proj": {"kernel": _lin(inw[d:2 * d]), "bias": inb[d:2 * d]},
        "v_proj": {"kernel": _lin(inw[2 * d:]), "bias": inb[2 * d:]},
        "out_proj": _linear(s, f"{p}.out_proj"),
    }


def convert_vit_baseline_state(
    state: Mapping[str, np.ndarray],
    in_domains: Sequence[str],
    depth: int = 12,
    prefix: str = "",
) -> Dict:
    """Reference downstream ViTBaseline (multimae_big_imcomplete.py:418-683)
    -> flax params for models.vit_baseline.ViTBaseline (crossattn mode)."""
    s = {k[len(prefix):]: np.asarray(v) for k, v in strip_prefixes(state).items()
         if k.startswith(prefix)}
    params: Dict = {
        "fusion_tokens": s["fusion_tokens"],
        "mask_embedding": s["mask_embedding"],
        "norm": {"gamma": s["norm.gamma"]},
        "pyramid": {
            "up1_conv1": _convt(s, "up1.0"),
            "up1_gn": {"scale": s["up1.1.weight"], "bias": s["up1.1.bias"]},
            "up1_conv2": _convt(s, "up1.3"),
            "up2_conv": _convt(s, "up2"),
        },
    }
    for d in in_domains:
        params[f"input_adapter_{d}"] = _input_adapter(s, f"input_adapters.{d}")
    for i in range(depth):
        params[f"block{i}"] = _encoder_block(s, f"blocks.{i}")
        params[f"fus_block{i}"] = _fusion_block(s, f"fus_blocks.{i}")
    return params


def convert_pixel_decoder_state(
    state: Mapping[str, np.ndarray],
    enc_layers: int = 2,
    num_levels: int = 3,
    prefix: str = "",
) -> Dict:
    """Reference MSDeformAttnPixelDecoder (msdeformattn{_vit}.py) -> flax
    params for models.pixel_decoder.MSDeformAttnPixelDecoder."""
    s = {k[len(prefix):]: np.asarray(v) for k, v in strip_prefixes(state).items()
         if k.startswith(prefix)}
    params: Dict = {"level_embed": s["transformer.level_embed"],
                    "fpn_lateral": _conv1x1_dense(s, "adapter_1.0"),
                    "fpn_lateral_gn": _ln(s, "adapter_1.1"),
                    "fpn_output": _conv2d(s, "layer_1.0"),
                    "fpn_output_gn": _ln(s, "layer_1.1"),
                    "mask_features": _conv1x1_dense(s, "mask_features")}
    n = 2
    while f"adapter_{n}.0.weight" in s:  # extra FPN levels (full-model quirk)
        params[f"fpn_lateral{n}"] = _conv1x1_dense(s, f"adapter_{n}.0")
        params[f"fpn_lateral{n}_gn"] = _ln(s, f"adapter_{n}.1")
        params[f"fpn_output{n}"] = _conv2d(s, f"layer_{n}.0")
        params[f"fpn_output{n}_gn"] = _ln(s, f"layer_{n}.1")
        n += 1
    for i in range(num_levels):
        params[f"input_proj{i}"] = _conv1x1_dense(s, f"input_proj.{i}.0")
        params[f"input_gn{i}"] = _ln(s, f"input_proj.{i}.1")
    for i in range(enc_layers):
        p = f"transformer.encoder.layers.{i}"
        params[f"enc_layer{i}"] = {
            "self_attn": {
                "sampling_offsets": _linear(s, f"{p}.self_attn.sampling_offsets"),
                "attention_weights": _linear(s, f"{p}.self_attn.attention_weights"),
                "value_proj": _linear(s, f"{p}.self_attn.value_proj"),
                "output_proj": _linear(s, f"{p}.self_attn.output_proj"),
            },
            "norm1": _ln(s, f"{p}.norm1"),
            "norm2": _ln(s, f"{p}.norm2"),
            "linear1": _linear(s, f"{p}.linear1"),
            "linear2": _linear(s, f"{p}.linear2"),
        }
    return params


def convert_mask2former_decoder_state(
    state: Mapping[str, np.ndarray],
    hidden_dim: int = 256,
    dec_layers: int = 3,
    prefix: str = "",
) -> Dict:
    """Reference MultiScaleMaskedTransformerDecoder -> flax params for
    models.mask2former_decoder.MultiScaleMaskedTransformerDecoder."""
    s = {k[len(prefix):]: np.asarray(v) for k, v in strip_prefixes(state).items()
         if k.startswith(prefix)}
    d = hidden_dim
    params: Dict = {
        "query_feat": s["query_feat.weight"],
        "query_embed": s["query_embed.weight"],
        "level_embed": s["level_embed.weight"],
        "decoder_norm": _ln(s, "decoder_norm"),
        "class_embed": _linear(s, "class_embed"),
        "mask_embed": {f"layer{i}": _linear(s, f"mask_embed.layers.{i}")
                       for i in range(3)},
    }
    for i in range(dec_layers):
        params[f"cross{i}"] = {
            "mha": _torch_mha(s, f"transformer_cross_attention_layers.{i}.multihead_attn", d),
            "norm": _ln(s, f"transformer_cross_attention_layers.{i}.norm"),
        }
        params[f"self{i}"] = {
            "mha": _torch_mha(s, f"transformer_self_attention_layers.{i}.self_attn", d),
            "norm": _ln(s, f"transformer_self_attention_layers.{i}.norm"),
        }
        params[f"ffn{i}"] = {
            "linear1": _linear(s, f"transformer_ffn_layers.{i}.linear1"),
            "linear2": _linear(s, f"transformer_ffn_layers.{i}.linear2"),
            "norm": _ln(s, f"transformer_ffn_layers.{i}.norm"),
        }
    return params


def convert_maskformer_state(
    state: Mapping[str, np.ndarray],
    in_domains: Sequence[str],
    depth: int = 12,
    enc_layers: int = 2,
    dec_layers: int = 3,
    hidden_dim: int = 256,
    backbone_prefix: str = "backbone.",
    pixel_decoder_prefix: str = "sem_seg_head.pixel_decoder.",
    predictor_prefix: str = "sem_seg_head.predictor.",
) -> Dict:
    """Full reference downstream checkpoint (MaskFormerModel_vit.py
    composition: backbone + sem_seg_head.{pixel_decoder,predictor}) -> the
    flax param tree models.maskformer.MaskFormerModel initializes."""
    return {
        "backbone": convert_vit_baseline_state(
            state, in_domains, depth=depth, prefix=backbone_prefix),
        "pixel_decoder": convert_pixel_decoder_state(
            state, enc_layers=enc_layers, prefix=pixel_decoder_prefix),
        "predictor": convert_mask2former_decoder_state(
            state, hidden_dim=hidden_dim, dec_layers=dec_layers,
            prefix=predictor_prefix),
    }
