"""Loss tests with golden values against hand-computed / torch-derived
references (reference criterion.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from incomplete_multimodal_fusion_tpu.losses import (
    masked_mse_loss,
    masked_l1_loss,
    masked_cross_entropy_loss,
    dino_loss,
    byol_loss,
    vicreg_loss,
    hard_negative_loss,
    dino_center_loss,
    uncertainty_weighting,
)
from incomplete_multimodal_fusion_tpu.losses.contrastive import init_dino_center


class TestMaskedLosses:
    def test_mse_unmasked_is_plain_mse(self):
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        got = masked_mse_loss(pred, tgt, None, patch_size=16)
        np.testing.assert_allclose(float(got), float(((pred - tgt) ** 2).mean()), rtol=1e-6)

    def test_mse_masked_only_counts_masked_patches(self):
        """Loss computed on masked patches only, per-sample mean then batch
        mean (criterion.py:104-111)."""
        pred = jnp.zeros((1, 32, 32, 1), jnp.float32)
        tgt = jnp.ones((1, 32, 32, 1), jnp.float32) * 2.0
        # 2x2 patch grid; only patch 0 masked
        mask = jnp.asarray([[1, 0, 0, 0]], jnp.int32)
        got = float(masked_mse_loss(pred, tgt, mask, patch_size=16))
        assert abs(got - 4.0) < 1e-6

    def test_mse_zero_mask_returns_zero(self):
        """criterion.py:100-102."""
        pred = jnp.ones((1, 32, 32, 1))
        tgt = jnp.zeros((1, 32, 32, 1))
        mask = jnp.zeros((1, 4), jnp.int32)
        assert float(masked_mse_loss(pred, tgt, mask, patch_size=16)) == 0.0

    def test_nanmean_drops_zero_mask_samples(self):
        """Per-sample 0/0 -> nan is dropped (criterion.py:110-111)."""
        pred = jnp.zeros((2, 32, 32, 1))
        tgt = jnp.ones((2, 32, 32, 1))
        mask = jnp.asarray([[1, 1, 1, 1], [0, 0, 0, 0]], jnp.int32)
        got = float(masked_mse_loss(pred, tgt, mask, patch_size=16))
        assert abs(got - 1.0) < 1e-6  # only sample 0 contributes

    def test_l1(self):
        pred = jnp.zeros((1, 32, 32, 1))
        tgt = jnp.full((1, 32, 32, 1), -3.0)
        mask = jnp.ones((1, 4), jnp.int32)
        assert abs(float(masked_l1_loss(pred, tgt, mask, patch_size=16)) - 3.0) < 1e-6

    def test_norm_pix(self):
        """norm_pix standardizes target per patch (criterion.py:90-96)."""
        rng = np.random.default_rng(1)
        tgt = jnp.asarray(rng.standard_normal((1, 32, 32, 1)) * 5 + 3, jnp.float32)
        pred = jnp.zeros_like(tgt)
        got = float(masked_mse_loss(pred, tgt, None, patch_size=16, norm_pix=True))
        # standardized target => mse(0, z) ~ var(z) ~ 1
        assert abs(got - 1.0) < 0.05

    def test_cross_entropy_against_manual(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.standard_normal((1, 32, 32, 5)), jnp.float32)
        tgt = jnp.asarray(rng.integers(0, 5, (1, 32, 32)), jnp.int32)
        got = float(masked_cross_entropy_loss(logits, tgt, None, patch_size=16))
        lp = jax.nn.log_softmax(logits, axis=-1)
        ref = -np.take_along_axis(np.asarray(lp), np.asarray(tgt)[..., None], axis=-1).mean()
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestContrastive:
    def test_dino_loss_torch_parity(self):
        """dino_loss_func (criterion.py:328-335), recomputed manually."""
        rng = np.random.default_rng(3)
        s = rng.standard_normal((4, 16)).astype(np.float32)
        t = rng.standard_normal((4, 16)).astype(np.float32)
        got = float(dino_loss(jnp.asarray(s), jnp.asarray(t)))

        def norm(x):
            return x / np.linalg.norm(x, axis=1, keepdims=True)

        sn, tn = norm(s), norm(t)
        ls = sn / 0.1
        ls = ls - ls.max(axis=-1, keepdims=True)
        log_soft = ls - np.log(np.exp(ls).sum(axis=-1, keepdims=True))
        tt = tn / 0.04
        tt = np.exp(tt - tt.max(axis=-1, keepdims=True))
        soft_t = tt / tt.sum(axis=-1, keepdims=True)
        ref = (-soft_t * log_soft).sum(axis=-1).mean()
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_dino_teacher_no_grad(self):
        s = jnp.ones((2, 8))
        g = jax.grad(lambda t: dino_loss(s, t))(jnp.ones((2, 8)) * 0.5)
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_byol_identical_inputs(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
        assert abs(float(byol_loss(x, x))) < 1e-5

    def test_vicreg_positive_and_zero_sim(self):
        x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 8)), jnp.float32)
        v_same = float(vicreg_loss(x, x))
        v_diff = float(vicreg_loss(x, -x))
        assert v_diff > v_same  # invariance term dominates

    def test_hard_negative_runs_and_finite(self):
        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
        v = float(hard_negative_loss(a, b))
        assert np.isfinite(v) and v > 0
        easy = float(hard_negative_loss(a, b, estimator="easy"))
        assert np.isfinite(easy)

    def test_dino_center_updates(self):
        state = init_dino_center(8)
        rng = np.random.default_rng(5)
        s = [jnp.asarray(rng.standard_normal((4, 8)), jnp.float32) for _ in range(2)]
        t = [jnp.asarray(rng.standard_normal((4, 8)), jnp.float32) for _ in range(2)]
        loss, new_state = dino_center_loss(state, s, t)
        assert np.isfinite(float(loss))
        assert not np.allclose(np.asarray(new_state.center), 0.0)


class TestBalancing:
    def test_uncertainty_identity_at_zero_logvar(self):
        losses = {"a": jnp.asarray(2.0), "b": jnp.asarray(3.0)}
        params = {"a": jnp.asarray(0.0), "b": jnp.asarray(0.0)}
        out = uncertainty_weighting(losses, params)
        assert float(out["a"]) == 2.0 and float(out["b"]) == 3.0

    def test_uncertainty_zero_loss_masked(self):
        """task_balancing.py:38-42."""
        losses = {"a": jnp.asarray(0.0)}
        params = {"a": jnp.asarray(1.5)}
        assert float(uncertainty_weighting(losses, params)["a"]) == 0.0
