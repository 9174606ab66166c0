"""Parity tests for the Pallas MSDA kernel vs the XLA core (the role the
reference's ops/test.py plays for its CUDA extension: forward equality and
gradient checks against the torch fallback, test.py:35-50)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.ops.msda import ms_deform_attn_core
from incomplete_multimodal_fusion_tpu.ops.pallas_msda import ms_deform_attn_pallas

SHAPES = [(8, 8), (4, 4), (2, 2)]


def make_inputs(rng, b=2, lq=13, m=2, d=8, p=3, shapes=SHAPES, dtype=np.float32):
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.normal(size=(b, s, m, d)).astype(dtype)
    # locations mostly inside [0, 1] with some outside to exercise the
    # zero-padding boundary semantics
    locs = rng.uniform(-0.2, 1.2, size=(b, lq, m, l, p, 2)).astype(dtype)
    aw = rng.uniform(size=(b, lq, m, l, p)).astype(dtype)
    aw = aw / aw.sum(axis=(-2, -1), keepdims=True)
    return jnp.asarray(value), tuple(shapes), jnp.asarray(locs), jnp.asarray(aw)


class TestForwardParity:
    def test_matches_xla_core(self):
        args = make_inputs(np.random.default_rng(0))
        ref = ms_deform_attn_core(*args)
        got = ms_deform_attn_pallas(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_under_jit(self):
        args = make_inputs(np.random.default_rng(1), b=1, lq=7, m=3, d=4, p=2)
        f = jax.jit(lambda v, l, a: ms_deform_attn_pallas(v, args[1], l, a))
        got = f(args[0], args[2], args[3])
        ref = ms_deform_attn_core(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_single_level(self):
        args = make_inputs(np.random.default_rng(2), shapes=[(5, 7)], p=4)
        ref = ms_deform_attn_core(*args)
        got = ms_deform_attn_pallas(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_boundary_zero_padding(self):
        """Points fully outside the grid must contribute exactly zero
        (grid_sample padding_mode='zeros')."""
        value, shapes, locs, aw = make_inputs(np.random.default_rng(3))
        far = jnp.full_like(locs, 3.0)  # all points far outside
        got = ms_deform_attn_pallas(value, shapes, far, aw)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


class TestGradParity:
    def test_grads_match_xla_core(self):
        value, shapes, locs, aw = make_inputs(np.random.default_rng(4))
        # keep locations strictly off integer pixels: the hat subgradient at
        # exact grid points is arbitrary (same caveat as grid_sample)
        locs = jnp.round(locs * 64) / 64 + 0.007

        def loss(core):
            def f(v, l, a):
                out = core(v, shapes, l, a)
                return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
            return f

        g_ref = jax.grad(loss(ms_deform_attn_core), argnums=(0, 1, 2))(value, locs, aw)
        g_got = jax.grad(loss(ms_deform_attn_pallas), argnums=(0, 1, 2))(value, locs, aw)
        for a, b, name in zip(g_got, g_ref, ("value", "locs", "weights")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_finite_diff_locations(self):
        value, shapes, locs, aw = make_inputs(
            np.random.default_rng(5), b=1, lq=3, m=1, d=4, p=2, shapes=[(6, 6)]
        )
        locs = locs * 0.8 + 0.1 + 0.0037  # interior, off-grid

        def f(l):
            return jnp.sum(ms_deform_attn_pallas(value, shapes, l, aw) ** 2)

        g = jax.grad(f)(locs)
        eps = 1e-3
        rng = np.random.default_rng(6)
        for _ in range(4):
            idx = tuple(rng.integers(0, s) for s in locs.shape)
            e = jnp.zeros_like(locs).at[idx].set(eps)
            fd = (float(f(locs + e)) - float(f(locs - e))) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), fd, atol=2e-2, rtol=2e-2)
