"""Regression tests for code-review findings (round 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.losses.set_criterion import SegTargets
from incomplete_multimodal_fusion_tpu.train import downstream as ds
from tests.test_downstream_model import CFG, batch
from incomplete_multimodal_fusion_tpu.models.maskformer import MaskFormerModel


def make_targets(b=2):
    masks = np.zeros((b, 4, 16, 16), np.float32)
    masks[:, 0, :, :8] = 1
    labels = np.asarray([[0, -1, -1, -1]] * b, np.int32)
    valid = np.asarray([[True, False, False, False]] * b)
    return SegTargets(jnp.asarray(labels), jnp.asarray(masks), jnp.asarray(valid))


@pytest.mark.slow
def test_loss_mix_is_exactly_03_03_04():
    """'ce' in 'loss_dice' double-counted dice into the CE term; the total
    must now equal 0.3*ce + 0.3*dice + 0.4*mask of the reported components."""
    model = MaskFormerModel(CFG)
    x = batch(0)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = ds.create_downstream_optimizer(params, lr=1e-3, clip_grad=0.0)
    state = ds.DownstreamState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=tx.init(params), rng=jax.random.PRNGKey(0))
    step = jax.jit(ds.make_downstream_train_step(
        model, CFG, tx, num_points=32, compute_dtype="float32"))
    _, m = step(state, x, make_targets())
    total = 0.3 * float(m["loss_ce"]) + 0.3 * float(m["loss_dice"]) + 0.4 * float(m["loss_mask"])
    np.testing.assert_allclose(float(m["loss"]), total, rtol=1e-5)


@pytest.mark.slow
def test_weight_dict_applied():
    """Reference CLASS/MASK/DICE weights 2/5/5 scale the reported components
    (maskformer_ake150.yaml + maskformer_train_ins_vit.py:123-131).

    The reference couples the weight_dict to the Hungarian costs, so doubling
    ``class_weight`` alone can legitimately FLIP the assignment at a random
    init (the round-3 flaky failure: loss_ce 25.66 vs 2x13.055 — a matcher
    flip, not a weighting bug; the loss terms are linear in the weights given
    a fixed assignment). Pin the matcher via the explicit ``cost_*``
    overrides and assert exact 2x scaling of the loss term."""
    model = MaskFormerModel(CFG)
    x = batch(1)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    tx = ds.create_downstream_optimizer(params, lr=1e-3, clip_grad=0.0)
    state = ds.DownstreamState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=tx.init(params), rng=jax.random.PRNGKey(1))
    kw = dict(num_points=32, compute_dtype="float32",
              cost_class=2.0, cost_mask=5.0, cost_dice=5.0)  # pinned matcher
    m1 = jax.jit(ds.make_downstream_train_step(
        model, CFG, tx, class_weight=2.0, dice_weight=50.0, mask_weight=50.0, **kw
    ))(state, x, make_targets())[1]
    m2 = jax.jit(ds.make_downstream_train_step(
        model, CFG, tx, class_weight=4.0, dice_weight=50.0, mask_weight=50.0, **kw
    ))(state, x, make_targets())[1]
    # identical assignments (same costs) => loss_ce scales exactly with
    # class_weight, and the mask/dice terms are untouched by it
    assert float(m2["loss_ce"]) == pytest.approx(2 * float(m1["loss_ce"]), rel=1e-4)
    assert float(m2["loss_dice"]) == pytest.approx(float(m1["loss_dice"]), rel=1e-5)
    assert float(m2["loss_mask"]) == pytest.approx(float(m1["loss_mask"]), rel=1e-5)


def test_sup_pretrain_raises_clear_error():
    from incomplete_multimodal_fusion_tpu.models.multimae import MultiMAE
    from incomplete_multimodal_fusion_tpu.ops import masking
    from tests.test_model import DOMAINS, NP_, batch as pbatch

    model = MultiMAE(in_domains=DOMAINS, out_domains=DOMAINS, image_size=64,
                     patch_size=16, dim_tokens=32, depth=2, dim_head=8, heads=2,
                     num_fusion_tokens=NP_, fusion_mode="sup")
    mi = masking.full_visible_mask_info(DOMAINS, (NP_,) * 3, 2)
    with pytest.raises(NotImplementedError, match="downstream backbone"):
        model.init(jax.random.PRNGKey(0), pbatch(0), mi, 48)


def test_infer_drop_does_not_truncate_kept_modalities():
    """Dropping 1 of 3 modalities must still encode ALL tokens of the kept
    ones regardless of the num_encoded_tokens argument."""
    from incomplete_multimodal_fusion_tpu import infer as infer_lib
    from incomplete_multimodal_fusion_tpu.ops import masking
    from tests.test_model import DOMAINS, NP_, batch as pbatch, tiny_model

    model = tiny_model()
    x = pbatch(0)
    mi = masking.full_visible_mask_info(DOMAINS, (NP_,) * 3, 2)
    params = model.init(jax.random.PRNGKey(0), x, mi, 3 * NP_)["params"]
    res = infer_lib.infer(model, params, x, 16, drop_modalities=("dem",))
    x2 = dict(x, s2=x["s2"] * 3.0)
    res2 = infer_lib.infer(model, params, x2, 16, drop_modalities=("dem",))
    assert not np.allclose(np.asarray(res.preds["s1"]),
                           np.asarray(res2.preds["s1"]), atol=1e-6)


def test_freeze_mask_covers_vit_adapter_paths():
    import flax

    params = {"backbone": {"vit": {
        "block1": {"k": jnp.zeros((2, 2))},
        "input_adapter_s1": {"k": jnp.zeros((2, 2))},
        "fus_block0": {"k": jnp.zeros((2, 2))},
    }}, "predictor": {"k": jnp.zeros((2, 2))}}
    mask = ds.freeze_mask(params, frozen_stages=3)
    flat = flax.traverse_util.flatten_dict(mask)
    assert not flat[("backbone", "vit", "block1", "k")]
    assert not flat[("backbone", "vit", "input_adapter_s1", "k")]
    assert not flat[("backbone", "vit", "fus_block0", "k")]
    assert flat[("predictor", "k")]


def test_label_map_from_targets():
    t = make_targets(b=1)
    gt = ds.label_map_from_targets(t)
    assert gt.shape == (1, 16, 16)
    assert int(gt[0, 0, 0]) == 1 and int(gt[0, 0, 12]) == 0
