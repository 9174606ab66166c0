"""Point-sampling Pallas kernel parity tests (vs the gather-based XLA
reference, forward + gradients; interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops.msda import bilinear_sample
from incomplete_multimodal_fusion_tpu.ops.pallas_points import point_sample_pallas


def xla_point_sample(masks, coords):
    n, h, w = masks.shape
    px = coords[..., 0] * w - 0.5
    py = coords[..., 1] * h - 0.5
    return jax.vmap(
        lambda m, x, y: bilinear_sample(m[..., None], x, y)[..., 0]
    )(masks, px, py)


@pytest.mark.parametrize("n,h,w,p", [(3, 16, 16, 40), (2, 8, 24, 100), (1, 64, 64, 300)])
def test_forward_parity(n, h, w, p):
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    # include points outside [0,1] to exercise the zero-padding border
    coords = jnp.asarray(rng.uniform(-0.1, 1.1, (n, p, 2)), jnp.float32)
    out = point_sample_pallas(masks, coords)
    ref = xla_point_sample(masks, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradient_parity():
    rng = np.random.default_rng(1)
    masks = jnp.asarray(rng.standard_normal((2, 12, 12)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0.05, 0.95, (2, 64, 2)), jnp.float32)

    def loss_pl(m, c):
        return jnp.sum(jnp.sin(point_sample_pallas(m, c)))

    def loss_ref(m, c):
        return jnp.sum(jnp.sin(xla_point_sample(m, c)))

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(masks, coords)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(masks, coords)
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_ref[1]), atol=2e-4)


def test_under_vmap():
    """The matcher vmaps point_sample over the batch — the kernel must
    batch correctly (extra leading grid dimension)."""
    rng = np.random.default_rng(2)
    masks = jnp.asarray(rng.standard_normal((4, 3, 8, 8)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0, 1, (4, 3, 20, 2)), jnp.float32)
    out = jax.vmap(point_sample_pallas)(masks, coords)
    ref = jax.vmap(xla_point_sample)(masks, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
