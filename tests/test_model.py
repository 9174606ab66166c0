"""MultiMAE model tests: shapes, masking semantics, dropout invariance.

The dropout-invariance tests are the load-bearing ones: they prove the
static-shape packed layout gives the same "incomplete modality" guarantee the
reference gets from physically removing tokens (multimae_crossattn.py:402-415).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.models.multimae import MultiMAE
from incomplete_multimodal_fusion_tpu.ops import masking

DOMAINS = ("s1", "s2", "dem")
IMG = 64
PATCH = 16
NP_ = (IMG // PATCH) ** 2  # 16 patches per modality
CH = {"s1": 1, "s2": 3, "dem": 1}


def tiny_model(**kw):
    return MultiMAE(
        in_domains=DOMAINS,
        out_domains=DOMAINS,
        image_size=IMG,
        patch_size=PATCH,
        dim_tokens=32,
        depth=2,
        dim_head=8,
        heads=2,
        ff_mult=2,
        num_fusion_tokens=NP_,
        decoder_dim=32,
        decoder_depth=1,
        decoder_num_heads=2,
        **kw,
    )


def batch(rng, b=2):
    r = np.random.default_rng(rng)
    return {d: jnp.asarray(r.standard_normal((b, IMG, IMG, CH[d])), jnp.float32) for d in DOMAINS}


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    x = batch(0)
    mi = masking.full_visible_mask_info(DOMAINS, (NP_,) * 3, 2)
    params = model.init(jax.random.PRNGKey(0), x, mi, 3 * NP_)["params"]
    return model, params


class TestForward:
    def test_output_shapes(self, model_and_params):
        model, params = model_and_params
        x = batch(1)
        e = 24
        mi = masking.generate_random_masks(jax.random.PRNGKey(1), DOMAINS, (NP_,) * 3, e, 2)
        out = model.apply({"params": params}, x, mi, e)
        for d in DOMAINS:
            assert out["preds"][d].shape == (2, IMG, IMG, CH[d])
        assert out["pooled"].shape == (2, 4, 32)
        assert out["ori_tokens"].shape == (2, e, 32)
        assert out["fusion_tokens"].shape == (2, NP_, 32)
        for d in DOMAINS:
            assert out["pooled_mod"][d].shape == (2, 32)
        assert all(np.isfinite(np.asarray(v)).all() for v in out["preds"].values())

    def test_full_visible_no_mask(self, model_and_params):
        """mask_inputs=False path (multimae_crossattn.py:384-385)."""
        model, params = model_and_params
        x = batch(2)
        mi = masking.full_visible_mask_info(DOMAINS, (NP_,) * 3, 2)
        out = model.apply({"params": params}, x, mi, 3 * NP_)
        assert out["ori_tokens"].shape == (2, 3 * NP_, 32)

    def test_dropped_modality_does_not_leak(self, model_and_params):
        """THE core property: with s2 fully masked, changing the s2 input
        pixels must not change any output (preds, pools). The reference
        achieves this by removing tokens (infer_mmae.py:344-361); we must
        achieve it with masks over a static layout."""
        model, params = model_and_params
        e = 32  # 2*NP_ slots for s1+dem
        masks = {
            "s1": jnp.zeros((2, NP_), jnp.int32),
            "s2": jnp.ones((2, NP_), jnp.int32),  # fully dropped
            "dem": jnp.zeros((2, NP_), jnp.int32),
        }
        mi = masking.mask_info_from_task_masks(masks, DOMAINS, e)
        xa = batch(3)
        xb = {k: (v if k != "s2" else v * 13.7 + 5.0) for k, v in xa.items()}
        oa = model.apply({"params": params}, xa, mi, e)
        ob = model.apply({"params": params}, xb, mi, e)
        for d in DOMAINS:
            np.testing.assert_allclose(
                np.asarray(oa["preds"][d]), np.asarray(ob["preds"][d]), atol=1e-5
            )
        np.testing.assert_allclose(
            np.asarray(oa["pooled"]), np.asarray(ob["pooled"]), atol=1e-5
        )

    def test_padding_slots_do_not_leak(self, model_and_params):
        """num_visible < num_encoded_tokens: padded slots must be inert.
        Same mask, same inputs, but different E (more padding) => same preds."""
        model, params = model_and_params
        masks = {
            "s1": jnp.zeros((2, NP_), jnp.int32),
            "s2": jnp.ones((2, NP_), jnp.int32),
            "dem": jnp.zeros((2, NP_), jnp.int32),
        }
        x = batch(4)
        mi32 = masking.mask_info_from_task_masks(masks, DOMAINS, 32)
        mi48 = masking.mask_info_from_task_masks(masks, DOMAINS, 48)
        o32 = model.apply({"params": params}, x, mi32, 32)
        o48 = model.apply({"params": params}, x, mi48, 48)
        for d in DOMAINS:
            np.testing.assert_allclose(
                np.asarray(o32["preds"][d]), np.asarray(o48["preds"][d]), atol=1e-4
            )
        np.testing.assert_allclose(
            np.asarray(o32["pooled"]), np.asarray(o48["pooled"]), atol=1e-4
        )

    def test_masked_tokens_do_not_leak_partial(self, model_and_params):
        """Partial masking: perturbing pixels only inside masked s1 patches
        must not change outputs (visible s1 patches unchanged)."""
        model, params = model_and_params
        rng = jax.random.PRNGKey(7)
        e = 24
        mi = masking.generate_random_masks(rng, DOMAINS, (NP_,) * 3, e, 2)
        m_s1 = np.asarray(mi.task_masks["s1"][0])  # [16], 1 = masked
        xa = batch(5)
        # perturb masked s1 patches only
        pert = np.array(np.asarray(xa["s1"]))
        g = IMG // PATCH
        for idx in np.nonzero(m_s1)[0]:
            r, c = divmod(int(idx), g)
            pert[:, r * PATCH:(r + 1) * PATCH, c * PATCH:(c + 1) * PATCH, :] += 42.0
        xb = dict(xa, s1=jnp.asarray(pert))
        oa = model.apply({"params": params}, xa, mi, e)
        ob = model.apply({"params": params}, xb, mi, e)
        for d in DOMAINS:
            np.testing.assert_allclose(
                np.asarray(oa["preds"][d]), np.asarray(ob["preds"][d]), atol=1e-5
            )

    def test_no_recompilation_across_mask_patterns(self, model_and_params):
        """Different dropout patterns (incl. whole-modality drops) must reuse
        one compiled program (BASELINE.md north-star #3)."""
        model, params = model_and_params
        e = 32
        fwd = jax.jit(lambda p, x, mi: model.apply({"params": p}, x, mi, e))
        x = batch(6)
        patterns = [
            {"s1": 0, "s2": 1, "dem": 0},
            {"s1": 1, "s2": 0, "dem": 0},
            {"s1": 0, "s2": 0, "dem": 1},
        ]
        for pat in patterns:
            masks = {
                d: jnp.full((2, NP_), pat[d], jnp.int32) for d in DOMAINS
            }
            mi = masking.mask_info_from_task_masks(masks, DOMAINS, e)
            fwd(params, x, mi)
        stats = fwd._cache_size()
        assert stats == 1, f"recompiled: cache size {stats}"

    def test_zorro_fusion_mode(self):
        """fusion_mode='zorro' (reference multimae.py): no fusion blocks."""
        model = tiny_model(fusion_mode="zorro")
        x = batch(8)
        e = 24
        mi = masking.generate_random_masks(jax.random.PRNGKey(2), DOMAINS, (NP_,) * 3, e, 2)
        params = model.init(jax.random.PRNGKey(0), x, mi, e)["params"]
        assert not any(k.startswith("fus_block") for k in params)
        out = model.apply({"params": params}, x, mi, e)
        assert out["preds"]["s2"].shape == (2, IMG, IMG, 3)


class TestBatchedDecoder:
    def test_batched_trunk_matches_sequential(self, model_and_params):
        """decoder_batch_tasks stacks the task-generic trunk params and vmaps
        one chain over tasks — must be numerically identical to T sequential
        adapter calls (same params, same math, different batching)."""
        _, params = model_and_params
        model = tiny_model(decoder_batch_tasks=True)
        model_seq = tiny_model(decoder_batch_tasks=False)
        x = batch(7)
        mi = masking.generate_random_masks(
            jax.random.PRNGKey(3), DOMAINS, (NP_,) * 3, 24, 2)
        ob = model.apply({"params": params}, x, mi, 24)
        os_ = model_seq.apply({"params": params}, x, mi, 24)
        for d in DOMAINS:
            np.testing.assert_allclose(
                np.asarray(ob["preds"][d]), np.asarray(os_["preds"][d]), atol=1e-5)

    def test_batched_grads_match_sequential(self, model_and_params):
        _, params = model_and_params
        model = tiny_model(decoder_batch_tasks=True)
        model_seq = tiny_model(decoder_batch_tasks=False)
        x = batch(8)
        mi = masking.full_visible_mask_info(DOMAINS, (NP_,) * 3, 2)

        def loss(m):
            def f(p):
                out = m.apply({"params": p}, x, mi, 3 * NP_)
                return sum(jnp.sum(v ** 2) for v in out["preds"].values())
            return jax.grad(f)(params)

        gb, gs = loss(model), loss(model_seq)
        for a, b_ in zip(jax.tree.leaves(gb), jax.tree.leaves(gs)):
            # different reduction order (vmapped stack vs sequential) ->
            # fp32 accumulation noise; bound abs error, not tight rel
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)


class TestFusionBlockEquivalence:
    def test_fusion_row_only_equals_full_attention(self):
        """FusionBlock computes attention for the fusion-row query only; the
        reference computes the full MxM attention and slices row -1
        (zorro_utils.py:252-258). Verify equality."""
        from incomplete_multimodal_fusion_tpu.models.layers import (
            FusionBlock, BiaslessLayerNorm, GEGLUFeedForward, ZorroAttention,
        )
        from flax import linen as nn

        class RefFusionBlock(nn.Module):
            dim_head: int = 8
            heads: int = 2
            ff_mult: int = 2

            @nn.compact
            def __call__(self, stack):
                b, n, m, d = stack.shape
                x = stack.reshape(b * n, m, d)
                h = ZorroAttention(self.dim_head, self.heads, name="attn")(
                    BiaslessLayerNorm(name="norm1")(x)
                )
                x = x + h
                fus = x[:, -1, :].reshape(b, n, d)
                fus = fus + GEGLUFeedForward(self.ff_mult, name="mlp")(
                    BiaslessLayerNorm(name="norm2")(fus)
                )
                return fus

        rng = np.random.default_rng(0)
        stack = jnp.asarray(rng.standard_normal((2, 5, 4, 16)), jnp.float32)
        ours = FusionBlock(dim_head=8, heads=2, ff_mult=2)
        ref = RefFusionBlock()
        p_ours = ours.init(jax.random.PRNGKey(1), stack)["params"]
        # map our param names onto the ref module's
        p_ref = {
            "norm1": p_ours["norm1"],
            "attn": {
                "norm": p_ours["attn_norm"],
                "to_q": p_ours["to_q"],
                "to_kv": p_ours["to_kv"],
                "to_out": p_ours["to_out"],
            },
            "norm2": p_ours["norm2"],
            "mlp": p_ours["mlp"],
        }
        out_ours = ours.apply({"params": p_ours}, stack)
        out_ref = ref.apply({"params": p_ref}, stack)
        np.testing.assert_allclose(np.asarray(out_ours), np.asarray(out_ref), atol=1e-5)


class TestFusionBlockFastEquivalence:
    def test_fast_equals_reference_block(self):
        """FusionBlockFast (flat-source norms + one-hot KV assembly) must
        match FusionBlock exactly given the same params and inputs."""
        from incomplete_multimodal_fusion_tpu.models.layers import (
            FusionBlock, FusionBlockFast,
        )

        rng = np.random.default_rng(0)
        b, e, f, t, d = 2, 10, 6, 2, 16
        packed = jnp.asarray(rng.standard_normal((b, e, d)), jnp.float32)
        fusion = jnp.asarray(rng.standard_normal((b, f, d)), jnp.float32)
        mask_emb = jnp.asarray(rng.standard_normal((1, f, d)), jnp.float32)
        # random permutation-style slot map: grid position g <- packed slot
        slot = np.stack([rng.permutation(t * f) for _ in range(b)])
        use = slot < e
        onehot = ((slot[..., None] == np.arange(e)) & use[..., None]).astype(np.float32)

        fast = FusionBlockFast(dim_head=8, heads=2, ff_mult=2)
        params = fast.init(jax.random.PRNGKey(0), packed, fusion, mask_emb,
                           jnp.asarray(onehot), jnp.asarray(use))["params"]
        out_fast = fast.apply({"params": params}, packed, fusion, mask_emb,
                              jnp.asarray(onehot), jnp.asarray(use))

        # build the explicit stack the reference block consumes
        gathered = np.einsum("bge,bed->bgd", onehot, np.asarray(packed))
        grid = gathered + np.where(use[..., None], 0, np.tile(np.asarray(mask_emb), (1, t, 1)))
        grid = grid.reshape(b, t, f, d).transpose(0, 2, 1, 3)  # [B, F, T, D]
        stack = np.concatenate([grid, np.asarray(fusion)[:, :, None, :]], axis=2)
        ref = FusionBlock(dim_head=8, heads=2, ff_mult=2)
        out_ref = ref.apply({"params": params}, jnp.asarray(stack))
        np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref), atol=2e-5)
