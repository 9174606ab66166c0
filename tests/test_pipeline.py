"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatching over a
``stage`` mesh axis must be bit-identical to the sequential block loop —
forward and gradients. No reference counterpart (the reference is DDP-only);
this pins the beyond-reference PP capability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.parallel import mesh as mesh_lib
from incomplete_multimodal_fusion_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params,
)


def _stage_mesh(s):
    return mesh_lib.make_mesh((s,), ("stage",), devices=jax.devices()[:s])


class TestPipeline:
    def test_matches_sequential_forward_and_grad(self):
        """8 dense blocks over 4 stages, 4 microbatches: outputs and grads
        (wrt params AND input) equal the plain sequential loop."""
        l, d, b = 8, 16, 8
        rng = np.random.default_rng(0)
        per_block = [
            {"w": jnp.asarray(rng.normal(size=(d, d)) / np.sqrt(d),
                              jnp.float32),
             "b": jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)}
            for _ in range(l)
        ]
        x = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

        def block_fn(p, y):
            return jnp.tanh(y @ p["w"] + p["b"])

        def sequential(per_block, x):
            for p in per_block:
                x = block_fn(p, x)
            return x

        mesh = _stage_mesh(4)
        stacked = stack_stage_params(per_block, 4)

        ref = sequential(per_block, x)
        out = jax.jit(
            lambda sp, x: pipeline_apply(block_fn, sp, x, mesh)
        )(stacked, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

        # gradients through the pipeline == gradients through the loop
        def loss_pipe(sp, x):
            return jnp.sum(pipeline_apply(block_fn, sp, x, mesh) ** 2)

        def loss_seq(per_block, x):
            return jnp.sum(sequential(per_block, x) ** 2)

        g_sp, g_x = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, x)
        g_ref, g_xref = jax.grad(loss_seq, argnums=(0, 1))(per_block, x)
        g_ref = stack_stage_params(g_ref, 4)
        for a, bb in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_xref),
                                   atol=1e-5)

    def test_encoder_blocks_pipelined(self):
        """The real EncoderBlock stack: 4 blocks over 4 stages on actual
        module params equals the sequential apply."""
        from incomplete_multimodal_fusion_tpu.models.layers import EncoderBlock

        d, n, b, l = 32, 8, 8, 4
        blk = EncoderBlock(dim_head=8, heads=2, ff_mult=2)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        per_block = [
            blk.init(jax.random.PRNGKey(i), x)["params"] for i in range(l)
        ]

        def block_fn(p, y):
            return blk.apply({"params": p}, y)

        ref = x
        for p in per_block:
            ref = block_fn(p, ref)

        mesh = _stage_mesh(4)
        stacked = stack_stage_params(per_block, 4)
        out = jax.jit(
            lambda sp, x: pipeline_apply(block_fn, sp, x, mesh,
                                         microbatches=2)
        )(stacked, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_stack_rejects_indivisible(self):
        with pytest.raises(ValueError):
            stack_stage_params([{"w": jnp.zeros(2)}] * 3, 2)
