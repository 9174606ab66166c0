"""KV-grid assembly custom VJP (ops/assemble.py): the gather-fwd /
matmul-bwd op must be bit-identical to the one-hot MXU matmul it replaces
— forward AND gradients, standalone and through the full flagship model
(reference scatter being reproduced: multimae_crossattn.py:454-460)."""
import jax
import jax.numpy as jnp
import numpy as np

from incomplete_multimodal_fusion_tpu.config import (
    DataConfig,
    DecoderConfig,
    MaskConfig,
    ModelConfig,
    OptimConfig,
    PretrainConfig,
    TrainConfig,
)
from incomplete_multimodal_fusion_tpu.data.synthetic import synthetic_batch
from incomplete_multimodal_fusion_tpu.models.multimae import build_multimae
from incomplete_multimodal_fusion_tpu.ops import masking
from incomplete_multimodal_fusion_tpu.ops.assemble import grid_assemble
from incomplete_multimodal_fusion_tpu.train import pretrain


def test_matches_onehot_matmul_fwd_and_bwd():
    rng = np.random.default_rng(0)
    b, e, g, c = 3, 24, 48, 16
    kv = jnp.asarray(rng.standard_normal((b, e, c)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, g, (b, g)), jnp.int32)
    nvis = jnp.asarray(rng.integers(5, e + 1, (b,)), jnp.int32)
    use = (slot < e) & (slot < nvis[:, None])

    onehot = ((slot[..., None] == jnp.arange(e)) & use[..., None]).astype(
        jnp.float32)

    def via_matmul(kv):
        return jnp.einsum("bge,bec->bgc", onehot, kv,
                          preferred_element_type=jnp.float32)

    def via_gather(kv):
        return grid_assemble(kv, slot, use)

    out_m = via_matmul(kv)
    out_g = via_gather(kv)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_g))

    ct = jnp.asarray(rng.standard_normal(out_m.shape), jnp.float32)
    g_m = jax.grad(lambda kv: jnp.sum(via_matmul(kv) * ct))(kv)
    g_g = jax.grad(lambda kv: jnp.sum(via_gather(kv) * ct))(kv)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_g),
                               atol=1e-6, rtol=1e-6)


def test_flagship_forward_and_grads_identical_across_assembly_modes():
    def cfg(mode):
        return PretrainConfig(
            model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2,
                              ff_mult=2, num_fusion_tokens=16,
                              kv_assembly=mode),
            data=DataConfig(input_size=64, patch_size=16, batch_size=4),
            mask=MaskConfig(num_encoded_tokens=24),
            decoder=DecoderConfig(dim=32, depth=1, num_heads=2),
            optim=OptimConfig(),
            train=TrainConfig(compute_dtype="float32"),
        )

    c_g, c_o = cfg("gather"), cfg("onehot")
    model_g, model_o = build_multimae(c_g), build_multimae(c_o)
    params = pretrain.init_model(model_g, c_g, jax.random.PRNGKey(0))

    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        np.random.default_rng(0), c_g.data.in_domains, 4, 64).items()}
    mi = masking.generate_random_masks(
        jax.random.PRNGKey(1), tuple(c_g.data.in_domains), (16, 16, 16),
        24, 4)

    loss_g = pretrain.make_loss_fn(model_g, c_g)
    loss_o = pretrain.make_loss_fn(model_o, c_o)
    rng = jax.random.PRNGKey(2)
    (l_g, _), gr_g = jax.value_and_grad(loss_g, has_aux=True)(
        params, {}, batch, mi, rng)
    (l_o, _), gr_o = jax.value_and_grad(loss_o, has_aux=True)(
        params, {}, batch, mi, rng)
    assert float(l_g) == float(l_o)
    f_g = jax.flatten_util.ravel_pytree(gr_g)[0]
    f_o = jax.flatten_util.ravel_pytree(gr_o)[0]
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_o),
                               atol=1e-6, rtol=1e-6)
