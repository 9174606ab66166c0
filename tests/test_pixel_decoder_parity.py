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


def test_pixel_decoder_golden():
    from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
        convert_pixel_decoder_state)

    g = np.load(GOLDEN)
    w = {k[len("w_"):]: g[k] for k in g.files if k.startswith("w_")}
    # the library converter (MIGRATION.md path) IS the mapping under test
    params = jax.tree.map(jnp.asarray, convert_pixel_decoder_state(w, enc_layers=1))

    # NCHW golden inputs -> NHWC, res2..res5 high->low resolution
    feats = [jnp.asarray(g[f"x_res{i}"].transpose(0, 2, 3, 1))
             for i in (2, 3, 4, 5)]

    # the golden was generated with true strides (4/8/16/32) -> the reference
    # built ONE fpn level; the full-model quirk (2 levels) is pinned by
    # tests/test_full_maskformer_parity.py
    model = MSDeformAttnPixelDecoder(
        conv_dim=32, mask_dim=32, transformer_enc_layers=1, n_heads=8,
        dim_feedforward=64, n_points=4, dropout=0.0, num_fpn_levels=1)
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
        dim_feedforward=64, n_points=4, dropout=0.0, num_fpn_levels=1)
    init = model.init(jax.random.PRNGKey(0), feats)["params"]
    init_paths = {"/".join(str(k.key) for k in p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    n_torch = sum(1 for k in g.files if k.startswith("w_"))
    assert len(init_paths) == n_torch, (len(init_paths), n_torch)
