"""Golden parity for models/maskformer_decoder.py against the executed
reference DETR Transformer (transformer.py:19-369; tensors frozen by
tests/golden/generate_detr_golden.py — no torch at runtime here).

Covers both norm orders (normalize_before False/True) through a 1-layer
encoder + 2-layer intermediate-returning decoder, exactly the stack
StandardTransformerDecoder assembles, plus an end-to-end smoke of
MaskFormerModel(decoder_type='standard')."""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from incomplete_multimodal_fusion_tpu.models.maskformer_decoder import (
    StandardTransformerDecoder, _DecoderLayer, _EncoderLayer)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "detr_golden.npz"


def _mha_params(w, prefix, d):
    inw, inb = w[f"{prefix}.in_proj_weight"], w[f"{prefix}.in_proj_bias"]
    return {
        "q_proj": {"kernel": inw[:d].T, "bias": inb[:d]},
        "k_proj": {"kernel": inw[d:2 * d].T, "bias": inb[d:2 * d]},
        "v_proj": {"kernel": inw[2 * d:].T, "bias": inb[2 * d:]},
        "out_proj": {"kernel": w[f"{prefix}.out_proj.weight"].T,
                     "bias": w[f"{prefix}.out_proj.bias"]},
    }


def _lin(w, prefix):
    return {"kernel": w[f"{prefix}.weight"].T, "bias": w[f"{prefix}.bias"]}


def _norm(w, prefix):
    return {"scale": w[f"{prefix}.weight"], "bias": w[f"{prefix}.bias"]}


class _Stack(nn.Module):
    """The Transformer core StandardTransformerDecoder builds
    (transformer.py:61-76): encoder over memory, then the query decoder with
    per-layer decoder_norm'd intermediates."""

    pre_norm: bool

    @nn.compact
    def __call__(self, src, pos, tgt, qpos):
        src = _EncoderLayer(32, 4, 64, self.pre_norm, name="enc0")(src, pos)
        if self.pre_norm:
            src = nn.LayerNorm(name="encoder_norm")(src)
        norm = nn.LayerNorm(name="decoder_norm")
        inter = []
        for i in range(2):
            tgt = _DecoderLayer(32, 4, 64, self.pre_norm, name=f"dec{i}")(
                tgt, src, pos, qpos)
            inter.append(norm(tgt))
        return jnp.stack(inter), src


@pytest.mark.parametrize("tag,pre", [("post", False), ("pre", True)])
def test_detr_transformer_golden(tag, pre):
    g = np.load(GOLDEN)
    w = {k[len(f"{tag}_w_"):]: g[k] for k in g.files if k.startswith(f"{tag}_w_")}
    d = 32

    def enc_layer(i):
        p = f"encoder.layers.{i}"
        return {
            "self_attn": _mha_params(w, f"{p}.self_attn", d),
            "linear1": _lin(w, f"{p}.linear1"),
            "linear2": _lin(w, f"{p}.linear2"),
            "norm1": _norm(w, f"{p}.norm1"),
            "norm2": _norm(w, f"{p}.norm2"),
        }

    def dec_layer(i):
        p = f"decoder.layers.{i}"
        return {
            "self_attn": _mha_params(w, f"{p}.self_attn", d),
            "multihead_attn": _mha_params(w, f"{p}.multihead_attn", d),
            "linear1": _lin(w, f"{p}.linear1"),
            "linear2": _lin(w, f"{p}.linear2"),
            "norm1": _norm(w, f"{p}.norm1"),
            "norm2": _norm(w, f"{p}.norm2"),
            "norm3": _norm(w, f"{p}.norm3"),
        }

    params = {"enc0": enc_layer(0), "dec0": dec_layer(0), "dec1": dec_layer(1),
              "decoder_norm": _norm(w, "decoder.norm")}
    if pre:
        params["encoder_norm"] = _norm(w, "encoder.norm")
    params = jax.tree.map(jnp.asarray, params)

    b, c, h, ww = g["src"].shape
    src = jnp.asarray(g["src"]).reshape(b, c, h * ww).transpose(0, 2, 1)
    pos = jnp.asarray(g["pos"]).reshape(b, c, h * ww).transpose(0, 2, 1)
    q = g["query"].shape[0]
    qpos = jnp.broadcast_to(jnp.asarray(g["query"])[None], (b, q, c))
    tgt = jnp.zeros((b, q, c), jnp.float32)

    hs, memory = _Stack(pre).apply({"params": params}, src, pos, tgt, qpos)

    np.testing.assert_allclose(np.asarray(hs), g[f"{tag}_hs"],
                               rtol=1e-4, atol=1e-4)
    mem_ref = g[f"{tag}_memory"].reshape(b, c, h * ww).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(memory), mem_ref,
                               rtol=1e-4, atol=1e-4)


def test_standard_decoder_end_to_end():
    """StandardTransformerDecoder produces the criterion/inference dict schema
    (maskformer_transformer_decoder.py:65-93) with deep supervision."""
    dec = StandardTransformerDecoder(num_classes=3, hidden_dim=32, num_queries=5,
                                     n_heads=4, dim_feedforward=64, enc_layers=1,
                                     dec_layers=2, mask_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 32))
    mf = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    params = dec.init(jax.random.PRNGKey(2), x, mf)
    out = dec.apply(params, x, mf)
    assert out["pred_logits"].shape == (2, 5, 4)
    assert out["pred_masks"].shape == (2, 5, 8, 8)
    assert len(out["aux_outputs"]) == 1
    assert all(np.isfinite(np.asarray(v)).all()
               for v in (out["pred_logits"], out["pred_masks"]))


def test_maskformer_standard_decoder_smoke():
    """decoder_type='standard' wires through MaskFormerModel and the set
    criterion consumes its outputs."""
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel)

    cfg = MaskFormerConfig(
        in_domains=("s1", "s2"), image_size=64, num_classes=2,
        dim_tokens=32, depth=2, dim_head=8, heads=2, num_fusion_tokens=16,
        conv_dim=32, mask_dim=32, transformer_enc_layers=1, num_queries=5,
        dec_layers=2, dim_feedforward=64, decoder_type="standard",
    )
    model = MaskFormerModel(cfg)
    x = {d: jax.random.normal(jax.random.PRNGKey(i), (1, 64, 64, ch))
         for i, (d, ch) in enumerate([("s1", 1), ("s2", 3)])}
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["pred_logits"].shape[1] == 5
    assert out["pred_masks"].ndim == 4
    assert len(out["aux_outputs"]) == 1
