"""DPT/ConvNeXt output-adapter utility tests (output_adapter_utils.py
equivalents)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.dpt_utils import (
    ConvNeXtBlock, DPTHead, FeatureFusionBlock, Interpolate, ResidualConvUnit,
    Scratch,
)


def test_convnext_block_shape_and_residual():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 16)),
                    jnp.float32)
    blk = ConvNeXtBlock(dim=16)
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == x.shape
    # residual: zeroed params (pwconv2 kernel+bias zero at init? no — force)
    zeroed = jax.tree.map(jnp.zeros_like, params)
    np.testing.assert_allclose(np.asarray(blk.apply(zeroed, x)), np.asarray(x))


def test_layer_scale():
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    blk = ConvNeXtBlock(dim=8, layer_scale_init_value=1e-6)
    params = blk.init(jax.random.PRNGKey(1), x)
    assert params["params"]["gamma"].shape == (8,)
    assert float(params["params"]["gamma"][0]) == pytest.approx(1e-6)


def test_residual_conv_unit_skip():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, 6, 4)),
                    jnp.float32)
    unit = ResidualConvUnit(4)
    params = unit.init(jax.random.PRNGKey(0), x)
    zeroed = jax.tree.map(jnp.zeros_like, params)
    np.testing.assert_allclose(np.asarray(unit.apply(zeroed, x)), np.asarray(x))


def test_fusion_block_upsamples_2x():
    x = jnp.ones((1, 8, 8, 16), jnp.float32)
    fb = FeatureFusionBlock(16)
    # init with the lateral present so res_unit1's params exist (the
    # no-lateral apply simply ignores them)
    params = fb.init(jax.random.PRNGKey(0), x, x)
    assert fb.apply(params, x, x).shape == (1, 16, 16, 16)
    assert fb.apply(params, x).shape == (1, 16, 16, 16)


def test_scratch_common_width():
    feats = [jnp.ones((1, 16 // s, 16 // s, c), jnp.float32)
             for s, c in ((1, 8), (2, 16), (4, 32), (8, 64))]
    sc = Scratch(24)
    params = sc.init(jax.random.PRNGKey(0), feats)
    outs = sc.apply(params, feats)
    assert [o.shape[-1] for o in outs] == [24, 24, 24, 24]


def test_dpt_head_end_to_end():
    """Full pyramid -> dense map: output at 2x the finest level's stride
    refinement (8 -> refine x2 -> head x2 over the 1/4-scale input)."""
    rng = np.random.default_rng(2)
    feats = [jnp.asarray(rng.standard_normal((2, 16 // s, 16 // s, 8 * s)),
                         jnp.float32) for s in (1, 2, 4, 8)]
    head = DPTHead(features=16, out_channels=3)
    params = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(params, feats)
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_align_corners_matches_torch():
    """_resize_bilinear(align_corners=True) must match
    torch.nn.functional.interpolate(mode='bilinear', align_corners=True) —
    the reference fusion blocks' semantics (output_adapter_utils.py:241)."""
    torch = pytest.importorskip("torch")
    from incomplete_multimodal_fusion_tpu.models.dpt_utils import _resize_bilinear

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    ours = np.asarray(_resize_bilinear(jnp.asarray(x), 14, 18, True))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 18),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # and align_corners=False against torch too
    ours_f = np.asarray(_resize_bilinear(jnp.asarray(x), 14, 18, False))
    ref_f = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 18),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours_f, ref_f, atol=1e-5)
