"""Golden parity for models/mask2former_decoder.py against the executed
reference MultiScaleMaskedTransformerDecoder (mask2former_transformer_decoder
.py:201-382; tensors frozen by generate_mask2former_decoder_golden.py — no
torch at runtime). One transplant drives the ENTIRE 3-level round-robin:
sine posembs, level embeds, masked cross-attention with the model's own
thresholded mask predictions, self-attn, FFN, deep-supervision heads."""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from incomplete_multimodal_fusion_tpu.models.mask2former_decoder import (
    MultiScaleMaskedTransformerDecoder)

GOLDEN = (pathlib.Path(__file__).parent / "golden" /
          "mask2former_decoder_golden.npz")

D, Q, HEADS, FF, LAYERS, K, MD = 32, 5, 4, 64, 3, 3, 16


def _mha(w, prefix):
    inw, inb = w[f"{prefix}.in_proj_weight"], w[f"{prefix}.in_proj_bias"]
    return {
        "q_proj": {"kernel": inw[:D].T, "bias": inb[:D]},
        "k_proj": {"kernel": inw[D:2 * D].T, "bias": inb[D:2 * D]},
        "v_proj": {"kernel": inw[2 * D:].T, "bias": inb[2 * D:]},
        "out_proj": {"kernel": w[f"{prefix}.out_proj.weight"].T,
                     "bias": w[f"{prefix}.out_proj.bias"]},
    }


def _norm(w, prefix):
    return {"scale": w[f"{prefix}.weight"], "bias": w[f"{prefix}.bias"]}


def _lin(w, prefix):
    return {"kernel": w[f"{prefix}.weight"].T, "bias": w[f"{prefix}.bias"]}


def test_mask2former_decoder_golden():
    g = np.load(GOLDEN)
    w = {k[len("w_"):]: g[k] for k in g.files if k.startswith("w_")}

    params = {
        "query_feat": w["query_feat.weight"],
        "query_embed": w["query_embed.weight"],
        "level_embed": w["level_embed.weight"],
        "decoder_norm": _norm(w, "decoder_norm"),
        "class_embed": _lin(w, "class_embed"),
        "mask_embed": {f"layer{i}": _lin(w, f"mask_embed.layers.{i}")
                       for i in range(3)},
    }
    for i in range(LAYERS):
        params[f"cross{i}"] = {
            "mha": _mha(w, f"transformer_cross_attention_layers.{i}.multihead_attn"),
            "norm": _norm(w, f"transformer_cross_attention_layers.{i}.norm"),
        }
        params[f"self{i}"] = {
            "mha": _mha(w, f"transformer_self_attention_layers.{i}.self_attn"),
            "norm": _norm(w, f"transformer_self_attention_layers.{i}.norm"),
        }
        params[f"ffn{i}"] = {
            "linear1": _lin(w, f"transformer_ffn_layers.{i}.linear1"),
            "linear2": _lin(w, f"transformer_ffn_layers.{i}.linear2"),
            "norm": _norm(w, f"transformer_ffn_layers.{i}.norm"),
        }
    params = jax.tree.map(jnp.asarray, params)

    x = [jnp.asarray(g[f"x_{i}"].transpose(0, 2, 3, 1)) for i in range(3)]
    mf = jnp.asarray(g["mask_features"].transpose(0, 2, 3, 1))

    model = MultiScaleMaskedTransformerDecoder(
        num_classes=K, hidden_dim=D, num_queries=Q, n_heads=HEADS,
        dim_feedforward=FF, dec_layers=LAYERS, mask_dim=MD)
    out = model.apply({"params": params}, x, mf)

    np.testing.assert_allclose(np.asarray(out["pred_logits"]), g["pred_logits"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]), g["pred_masks"],
                               rtol=2e-4, atol=2e-4)
    assert len(out["aux_outputs"]) == LAYERS
    for i, aux in enumerate(out["aux_outputs"]):
        np.testing.assert_allclose(np.asarray(aux["pred_logits"]),
                                   g[f"aux_{i}_logits"], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(aux["pred_masks"]),
                                   g[f"aux_{i}_masks"], rtol=2e-4, atol=2e-4)
