"""Unit tests for posemb / patches / masking / attention ops.

Golden-value parity targets cite the reference implementation they mirror.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops import posemb, patches, masking, attention


class TestPosemb:
    def test_shape_and_blocks(self):
        pe = posemb.build_2d_sincos_posemb(16, 16, 192)
        assert pe.shape == (256, 192)
        # multimae_utils.py:29-45: channel blocks [sin_w, cos_w, sin_h, cos_h]
        # first token (0,0): sin=0, cos=1 in both blocks
        np.testing.assert_allclose(pe[0, :48], 0.0, atol=1e-6)
        np.testing.assert_allclose(pe[0, 48:96], 1.0, atol=1e-6)

    def test_matches_torch_reference_formula(self):
        """Recompute the reference formula in numpy and compare."""
        h = w = 4
        dim = 16
        gw = np.arange(w, dtype=np.float32)
        gh = np.arange(h, dtype=np.float32)
        grid_w, grid_h = np.meshgrid(gw, gh, indexing="ij")
        pos_dim = dim // 4
        omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
        omega = 1.0 / (10000.0 ** omega)
        out_w = np.einsum("m,d->md", grid_w.flatten(), omega)
        out_h = np.einsum("m,d->md", grid_h.flatten(), omega)
        ref = np.concatenate(
            [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
        )
        ours = np.asarray(posemb.build_2d_sincos_posemb(h, w, dim))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_resize_identity(self):
        pe = posemb.build_2d_sincos_posemb(8, 8, 64)
        out = posemb.resize_posemb(pe, (8, 8), (8, 8))
        assert out is pe


class TestPatches:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        p = patches.patchify(img, 16)
        assert p.shape == (2, 4, 16 * 16 * 3)
        back = patches.unpatchify(p, 16, 2, 2, 3)
        np.testing.assert_allclose(np.asarray(back), np.asarray(img))

    def test_patch_pixel_order(self):
        # pixel order is (ph, pw, c): criterion.py:77 '(p1 p2 c)'
        img = jnp.arange(2 * 2 * 2, dtype=jnp.float32).reshape(1, 2, 2, 2)
        p = patches.patchify(img, 2)[0, 0]
        np.testing.assert_array_equal(np.asarray(p), np.arange(8, dtype=np.float32))

    def test_conv_patch_embed_equals_matmul(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((2 * 2 * 3, 5)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
        out = patches.conv_patch_embed(img, k, b, 2)
        assert out.shape == (2, 16, 5)
        manual = patches.patchify(img, 2) @ k + b
        np.testing.assert_allclose(np.asarray(out), np.asarray(manual), rtol=1e-6)


class TestMasking:
    NAMES = ("s1", "s2", "dem")
    NUMS = (256, 256, 256)

    def test_exact_budget(self):
        """Exactly num_encoded_tokens visible (multimae_crossattn.py:264-272)."""
        key = jax.random.PRNGKey(0)
        mi = masking.generate_random_masks(key, self.NAMES, self.NUMS, 384, 4)
        total_visible = sum(int((np.asarray(m) == 0).sum()) for m in mi.task_masks.values())
        assert total_visible == 384 * 4  # batch-shared, 4 rows
        assert np.all(np.asarray(mi.num_visible) == 384)

    def test_batch_shared(self):
        """Mask replicated across batch (multimae_crossattn.py:276-278)."""
        key = jax.random.PRNGKey(1)
        mi = masking.generate_random_masks(key, self.NAMES, self.NUMS, 384, 3)
        for m in mi.task_masks.values():
            m = np.asarray(m)
            assert (m == m[0]).all()

    def test_order_groups_by_modality(self):
        """Packed order = visible tokens ascending (grouped by modality),
        matching the reference's cat(s1_vis, s2_vis, dem_vis)."""
        key = jax.random.PRNGKey(2)
        mi = masking.generate_random_masks(key, self.NAMES, self.NUMS, 384, 1)
        keep = np.asarray(mi.order[0, :384])
        assert (np.diff(keep) > 0).all()  # strictly ascending global index
        mask_all = np.concatenate([np.asarray(mi.task_masks[t][0]) for t in self.NAMES])
        assert (mask_all[keep] == 0).all()

    def test_ids_restore_inverse(self):
        key = jax.random.PRNGKey(3)
        mi = masking.generate_random_masks(key, self.NAMES, self.NUMS, 128, 2)
        order = np.asarray(mi.order[0])
        restore = np.asarray(mi.ids_restore[0])
        np.testing.assert_array_equal(order[restore], np.arange(768))

    def test_dirichlet_alpha_effect(self):
        """Low alpha concentrates the budget; high alpha spreads it."""
        key = jax.random.PRNGKey(4)
        counts = []
        for i in range(20):
            mi = masking.generate_random_masks(
                jax.random.fold_in(key, i), self.NAMES, self.NUMS, 384, 1, alphas=1000.0
            )
            counts.append([int((np.asarray(m) == 0).sum()) for m in mi.task_masks.values()])
        counts = np.asarray(counts, np.float32)
        # alpha->inf: uniform thirds of 384
        assert abs(counts.mean() - 128.0) < 8

    def test_user_task_masks_partial_dropout(self):
        """Modality ablation path (infer_mmae.py:344-361): drop s2 entirely."""
        b = 2
        masks = {
            "s1": jnp.zeros((b, 256), jnp.int32),
            "s2": jnp.ones((b, 256), jnp.int32),
            "dem": jnp.zeros((b, 256), jnp.int32),
        }
        mi = masking.mask_info_from_task_masks(masks, self.NAMES, 768)
        assert np.all(np.asarray(mi.num_visible) == 512)
        keep = np.asarray(mi.order[0, :512])
        assert ((keep < 256) | (keep >= 512)).all()  # no s2 token packed

    def test_full_visible(self):
        mi = masking.full_visible_mask_info(self.NAMES, self.NUMS, 2)
        assert np.all(np.asarray(mi.num_visible) == 768)

    def test_make_mask(self):
        masks = masking.make_mask(2, 2, {"s1": [(0, 0), (1, 1)]}, full_tasks=["s1"])
        assert np.asarray(masks["s1"]).sum() == 0


class TestAttentionOps:
    def test_zorro_mask_structure(self):
        """Modality-diagonal + fusion row (multimae_crossattn.py:431-447)."""
        types = jnp.asarray([[0, 0, 1, 1, 2, 3, 3]])
        m = np.asarray(attention.zorro_mask_from_types(types, types, 3))
        # s1 token attends s1 only
        np.testing.assert_array_equal(m[0, 0], [1, 1, 0, 0, 0, 0, 0])
        # fusion attends everything
        np.testing.assert_array_equal(m[0, 5], [1, 1, 1, 1, 1, 1, 1])

    def test_valid_excludes_padding(self):
        types = jnp.asarray([[0, 0, 3]])
        valid = jnp.asarray([[True, False, True]])
        m = np.asarray(attention.zorro_mask_from_types(types, types, 3, valid_k=valid))
        assert not m[0, 0, 1] and m[0, 0, 0]

    def test_packed_token_types(self):
        order = jnp.asarray([[0, 256, 300, 511, 600, 5, 7, 8]])
        t = attention.packed_token_types(order, (256, 256, 256), 5, 2, 3)
        np.testing.assert_array_equal(np.asarray(t[0]), [0, 1, 1, 1, 2, 3, 3])

    def test_masked_attention_equals_subset(self):
        """Masked SDPA == attention over the visible subset only."""
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, 2, 2, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 5, 2, 8)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 5, 2, 8)), jnp.float32)
        mask = jnp.asarray([True, True, False, True, False])[None, None, None, :]
        out_masked = attention.multihead_attention(q, k, v, mask=mask)
        out_subset = attention.multihead_attention(
            q, k[:, [0, 1, 3]], v[:, [0, 1, 3]]
        )
        np.testing.assert_allclose(
            np.asarray(out_masked), np.asarray(out_subset), atol=1e-5
        )


class TestIncompleteMasksPerSample:
    def test_per_sample_masks_differ(self):
        """batch_shared=False gives each sample its own keep-mask while the
        modality subset stays per-step (VERDICT.md Weak #6)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from incomplete_multimodal_fusion_tpu.ops import masking

        present = jnp.asarray([True, True, False])
        nums = (16, 16, 16)
        mi_shared = masking.incomplete_random_masks(
            jax.random.PRNGKey(0), ("s1", "s2", "dem"), nums, present,
            num_encoded_tokens=32, batch_size=4, batch_shared=True)
        mi_ps = masking.incomplete_random_masks(
            jax.random.PRNGKey(0), ("s1", "s2", "dem"), nums, present,
            num_encoded_tokens=32, batch_size=4, batch_shared=False)
        m_sh = np.asarray(mi_shared.task_masks["s1"])
        m_ps = np.asarray(mi_ps.task_masks["s1"])
        assert all((m_sh[0] == m_sh[i]).all() for i in range(4))
        assert any((m_ps[0] != m_ps[i]).any() for i in range(1, 4))
        # absent modality fully masked in both
        for mi in (mi_shared, mi_ps):
            assert np.asarray(mi.task_masks["dem"]).all()
        # same per-sample visible count (keep_ratio of present tokens)
        assert np.asarray(mi_ps.num_visible).tolist() == [28] * 4
