"""Multi-scale deformable attention parity vs torch grid_sample oracle
(the role reference ops/test.py plays: new kernel vs the torch core,
ms_deform_attn_func.py:52-77)."""
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops import msda

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_oracle(value, spatial_shapes, locs, weights):
    """ms_deform_attn_core_pytorch semantics, straight from grid_sample."""
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = locs.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # [N*M, Lq, P, 2]
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        )  # [N*M, D, Lq, P]
    w_ = weights.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w_).sum(-1)
    return out.view(n, m * d, lq).transpose(1, 2).contiguous()


@pytest.mark.parametrize("seed", [0, 1])
def test_core_parity(seed):
    rng = np.random.default_rng(seed)
    shapes = [(8, 8), (4, 4), (2, 2)]
    s = sum(h * w for h, w in shapes)
    b, m, d, lq, p = 2, 2, 8, 10, 4
    l = len(shapes)
    value = rng.standard_normal((b, s, m, d)).astype(np.float32)
    # locations straddle in/out of bounds to exercise zero padding
    locs = rng.uniform(-0.2, 1.2, (b, lq, m, l, p, 2)).astype(np.float32)
    w = rng.random((b, lq, m, l, p)).astype(np.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)

    ours = msda.ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
    )
    ref = torch_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(locs), torch.from_numpy(w)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_bilinear_zero_padding():
    img = jnp.ones((4, 4, 1))
    # far outside -> 0; border straddle -> partial
    v_out = msda.bilinear_sample(img, jnp.asarray([-5.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(v_out), 0.0)
    v_half = msda.bilinear_sample(img, jnp.asarray([-0.5]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(v_half), 0.5)
