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


def test_mask2former_decoder_golden():
    from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
        convert_mask2former_decoder_state)

    g = np.load(GOLDEN)
    w = {k[len("w_"):]: g[k] for k in g.files if k.startswith("w_")}
    # the library converter (MIGRATION.md path) IS the mapping under test
    params = jax.tree.map(
        jnp.asarray,
        convert_mask2former_decoder_state(w, hidden_dim=D, dec_layers=LAYERS))

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
