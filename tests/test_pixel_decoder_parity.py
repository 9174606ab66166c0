"""Golden parity for models/pixel_decoder.py against the executed reference
MSDeformAttnPixelDecoder (msdeformattn.py:166-311 + the pytorch MSDeformAttn
core; tensors frozen by tests/golden/generate_pixel_decoder_golden.py — no
torch at runtime). Covers: per-level input projections + GroupNorm, sine
position embeddings, level embeddings, the deformable encoder layer
(sampling offsets / attention weights / value + output projections,
post-norm FFN), the FPN lateral/output step, and the mask-features head."""
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from incomplete_multimodal_fusion_tpu.models.pixel_decoder import (
    MSDeformAttnPixelDecoder)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "pixel_decoder_golden.npz"


def _lin(w, prefix):
    return {"kernel": w[f"{prefix}.weight"].T, "bias": w[f"{prefix}.bias"]}


def _conv1x1(w, prefix):
    # torch [O, I, 1, 1] -> flax Dense [I, O]
    return {"kernel": w[f"{prefix}.weight"][:, :, 0, 0].T,
            "bias": w[f"{prefix}.bias"]}


def _gn(w, prefix):
    return {"scale": w[f"{prefix}.weight"], "bias": w[f"{prefix}.bias"]}


def test_pixel_decoder_golden():
    g = np.load(GOLDEN)
    w = {k[len("w_"):]: g[k] for k in g.files if k.startswith("w_")}

    params = {"level_embed": w["transformer.level_embed"]}
    for i in range(3):
        params[f"input_proj{i}"] = _conv1x1(w, f"input_proj.{i}.0")
        params[f"input_gn{i}"] = _gn(w, f"input_proj.{i}.1")
    p = "transformer.encoder.layers.0"
    params["enc_layer0"] = {
        "self_attn": {
            "sampling_offsets": _lin(w, f"{p}.self_attn.sampling_offsets"),
            "attention_weights": _lin(w, f"{p}.self_attn.attention_weights"),
            "value_proj": _lin(w, f"{p}.self_attn.value_proj"),
            "output_proj": _lin(w, f"{p}.self_attn.output_proj"),
        },
        "norm1": {"scale": w[f"{p}.norm1.weight"], "bias": w[f"{p}.norm1.bias"]},
        "norm2": {"scale": w[f"{p}.norm2.weight"], "bias": w[f"{p}.norm2.bias"]},
        "linear1": _lin(w, f"{p}.linear1"),
        "linear2": _lin(w, f"{p}.linear2"),
    }
    params["fpn_lateral"] = _conv1x1(w, "adapter_1.0")
    params["fpn_lateral_gn"] = _gn(w, "adapter_1.1")
    # torch conv [O, I, 3, 3] -> flax [3, 3, I, O]
    params["fpn_output"] = {"kernel": w["layer_1.0.weight"].transpose(2, 3, 1, 0),
                            "bias": w["layer_1.0.bias"]}
    params["fpn_output_gn"] = _gn(w, "layer_1.1")
    params["mask_features"] = _conv1x1(w, "mask_features")
    params = jax.tree.map(jnp.asarray, params)

    # NCHW golden inputs -> NHWC, res2..res5 high->low resolution
    feats = [jnp.asarray(g[f"x_res{i}"].transpose(0, 2, 3, 1))
             for i in (2, 3, 4, 5)]

    model = MSDeformAttnPixelDecoder(
        conv_dim=32, mask_dim=32, transformer_enc_layers=1, n_heads=8,
        dim_feedforward=64, n_points=4, dropout=0.0)
    mask_features, ms = model.apply({"params": params}, feats,
                                    deterministic=True)

    for i in range(3):
        ref = g[f"ms_{i}"].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ms[i]), ref, rtol=2e-4, atol=2e-4)
    ref_mf = g["mask_features"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(mask_features), ref_mf,
                               rtol=2e-4, atol=2e-4)


def test_param_structure_matches_init():
    """The transplanted tree must be exactly the tree the module initializes
    (no silently-unused leaves)."""
    g = np.load(GOLDEN)
    feats = [jnp.asarray(g[f"x_res{i}"].transpose(0, 2, 3, 1))
             for i in (2, 3, 4, 5)]
    model = MSDeformAttnPixelDecoder(
        conv_dim=32, mask_dim=32, transformer_enc_layers=1, n_heads=8,
        dim_feedforward=64, n_points=4, dropout=0.0)
    init = model.init(jax.random.PRNGKey(0), feats)["params"]
    init_paths = {"/".join(str(k.key) for k in p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    n_torch = sum(1 for k in g.files if k.startswith("w_"))
    assert len(init_paths) == n_torch, (len(init_paths), n_torch)
