"""End-to-end pretrain step tests: loss decreases, schedules correct,
data-parallel sharding over an 8-device CPU mesh (SURVEY §4 implication (d))."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from incomplete_multimodal_fusion_tpu.parallel import mesh as mesh_lib
from incomplete_multimodal_fusion_tpu.parallel import sharding as shard_lib
from incomplete_multimodal_fusion_tpu.train import pretrain, schedules


def tiny_cfg(**train_kw):
    return PretrainConfig(
        model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2, ff_mult=2,
                          num_fusion_tokens=16),
        data=DataConfig(input_size=64, patch_size=16, batch_size=8),
        mask=MaskConfig(num_encoded_tokens=24),
        decoder=DecoderConfig(dim=32, depth=1, num_heads=2),
        optim=OptimConfig(),
        train=TrainConfig(compute_dtype="float32", **train_kw),
    )


class TestSchedules:
    def test_cosine_warmup_then_decay(self):
        """native_scaler.py:65-82 semantics."""
        s = schedules.cosine_scheduler(1.0, 0.0, 100, warmup_steps=10, start_warmup_value=0.0)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(5)), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(s(55)), 0.5, atol=1e-6)  # cosine midpoint
        np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-6)

    def test_lr_scaling_rule(self):
        assert schedules.scaled_lr(1e-4, 256) == pytest.approx(1e-4)
        assert schedules.scaled_lr(1e-4, 512) == pytest.approx(2e-4)


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases(self):
        cfg = tiny_cfg()
        model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(0), total_steps=100)
        step = jax.jit(pretrain.make_train_step(model, cfg, tx))
        rng = np.random.default_rng(0)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            rng, cfg.data.in_domains, 8, 64).items()}
        losses = []
        for _ in range(12):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    @pytest.mark.slow
    def test_metrics_keys(self):
        cfg = tiny_cfg()
        model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(1), total_steps=10)
        step = jax.jit(pretrain.make_train_step(model, cfg, tx))
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(1), cfg.data.in_domains, 4, 64).items()}
        _, m = step(state, batch)
        for k in ("loss", "contra_loss", "recon_loss", "grad_norm", "s1_loss", "s2_loss", "dem_loss"):
            assert k in m

    @pytest.mark.slow
    def test_uncertainty_balancer(self):
        cfg = dataclasses.replace(tiny_cfg(), optim=OptimConfig(task_balancer="uncertainty"))
        model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(2), total_steps=10)
        step = jax.jit(pretrain.make_train_step(model, cfg, tx))
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(2), cfg.data.in_domains, 4, 64).items()}
        s2, _ = step(state, batch)
        # log-vars moved
        moved = any(
            float(jnp.abs(s2.balancer_params[d])) > 0 for d in cfg.data.out_domains
        )
        assert moved

    @pytest.mark.slow
    def test_balancer_rides_adamw_param_group(self):
        """The log-vars get a real AdamW param group on the LR schedule
        (optim_factory.py:137-149), not a hard-coded SGD step: the balancer
        optimizer state must exist and advance, and the first update's
        magnitude must be ~lr (Adam's unit-scaled first step), not 1e-3."""
        cfg = dataclasses.replace(tiny_cfg(), optim=OptimConfig(
            task_balancer="uncertainty", warmup_epochs=0, blr=1e-3))
        model, state, tx = pretrain.create_train_state(
            cfg, jax.random.PRNGKey(2), total_steps=10)
        assert isinstance(tx, pretrain.Optimizers) and tx.balancer is not None
        assert state.bal_opt_state is not None
        step = jax.jit(pretrain.make_train_step(model, cfg, tx))
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(2), cfg.data.in_domains, 4, 64).items()}
        s2, _ = step(state, batch)
        flat_new = jax.tree.leaves(s2.bal_opt_state)
        flat_old = jax.tree.leaves(state.bal_opt_state)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(flat_new, flat_old)
        ), "balancer optimizer state did not advance"


class TestDataParallel:
    @pytest.mark.slow
    def test_sharded_step_matches_single_device(self):
        """DP over 8 CPU devices == single-device numerics (replaces the
        reference's DDP gradient averaging, pretrain_mmae.py:342-349)."""
        cfg = tiny_cfg()
        model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(3), total_steps=10)
        step_fn = pretrain.make_train_step(model, cfg, tx)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(3), cfg.data.in_domains, 8, 64).items()}

        # single device
        s1, m1 = jax.jit(step_fn)(state, batch)

        # 8-device data parallel
        mesh = mesh_lib.data_parallel_mesh()
        assert mesh.devices.size == 8
        sharded_batch = shard_lib.shard_batch(batch, mesh)
        repl = shard_lib.replicated(mesh)
        state_r = jax.device_put(state, repl)
        s8, m8 = jax.jit(step_fn)(state_r, sharded_batch)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
        l1 = jax.tree.leaves(s1.params)
        l8 = jax.tree.leaves(s8.params)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    @pytest.mark.slow
    def test_tensor_parallel_shardings_compile(self):
        """TP over a ('data','model') mesh: kernels sharded on hidden dim,
        XLA inserts the collectives; one step must compile and run."""
        cfg = tiny_cfg()
        model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(4), total_steps=10)
        step_fn = pretrain.make_train_step(model, cfg, tx)
        mesh = mesh_lib.make_mesh((2, 4), ("data", "model"))
        p_shard = shard_lib.params_shardings(state.params, mesh, model_axis="model")
        repl = shard_lib.replicated(mesh)
        state_s = pretrain.TrainState(
            step=jax.device_put(state.step, repl),
            params=jax.tree.map(jax.device_put, state.params, p_shard),
            balancer_params=state.balancer_params,
            opt_state=jax.device_put(state.opt_state, repl),
            rng=jax.device_put(state.rng, repl),
        )
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(4), cfg.data.in_domains, 4, 64).items()}
        sharded_batch = shard_lib.shard_batch(batch, mesh)
        s2, m = jax.jit(step_fn)(state_s, sharded_batch)
        assert np.isfinite(float(m["loss"]))

    @pytest.mark.slow
    def test_sequence_parallel_matches_single_device(self):
        """SP (parallel/sp.py): sequence-sharding the residual stream over
        the model axis between encoder blocks is a layout annotation, so
        TP+SP numerics must equal the plain single-device step. Tokens
        e+f = 24+16 = 40 divide tp=4 exactly."""
        from incomplete_multimodal_fusion_tpu.parallel import sp as sp_lib

        cfg = tiny_cfg()
        model, state, tx = pretrain.create_train_state(
            cfg, jax.random.PRNGKey(11), total_steps=10)
        step_fn = pretrain.make_train_step(model, cfg, tx)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(11), cfg.data.in_domains, 8, 64).items()}

        s1, m1 = jax.jit(step_fn)(state, batch)

        mesh = mesh_lib.make_mesh((2, 4), ("data", "model"))
        p_shard = shard_lib.params_shardings(state.params, mesh,
                                             model_axis="model")
        repl = shard_lib.replicated(mesh)
        state_s = pretrain.TrainState(
            step=jax.device_put(state.step, repl),
            params=jax.tree.map(jax.device_put, state.params, p_shard),
            balancer_params=state.balancer_params,
            opt_state=jax.device_put(state.opt_state, repl),
            rng=jax.device_put(state.rng, repl),
        )
        sp_step = pretrain.make_train_step(model, cfg, tx,
                                           sp=sp_lib.SPSpec(mesh))
        s2, m2 = jax.jit(sp_step)(state_s, shard_lib.shard_batch(batch, mesh))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=2e-5)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_sp_shard_is_identity_without_spec(self):
        from incomplete_multimodal_fusion_tpu.parallel import sp as sp_lib

        x = jnp.ones((2, 8, 4))
        assert sp_lib.sp_shard(x, None) is x


class TestHybridMesh:
    def test_single_slice_falls_back_to_flat_mesh(self):
        """CPU test devices carry no slice_index -> one slice -> hybrid_mesh
        must degrade to a plain mesh of the same overall shape so
        hybrid-layout code runs unchanged on one slice."""
        mesh = mesh_lib.hybrid_mesh((1, 2), axes=("data", "model"))
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.size == 8
        assert mesh.devices.shape == (4, 2)  # -1 data dim absorbed 8/2

    def test_dcn_dp_one_is_flat(self):
        mesh = mesh_lib.hybrid_mesh((8,), axes=("data",),
                                    dcn_data_parallelism=1)
        assert mesh.devices.shape == (8,)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt

        cfg = tiny_cfg()
        model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(5), total_steps=10)
        ckpt.save_checkpoint(str(tmp_path), 3, {"params": state.params, "step": 3})
        assert ckpt.latest_step(str(tmp_path)) == 3
        restored = ckpt.restore_checkpoint(
            str(tmp_path), {"params": state.params, "step": 0}
        )
        assert int(restored["step"]) == 3
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFSDP:
    @pytest.mark.slow
    def test_fsdp_step_matches_single_device(self):
        """ZeRO-3-style param+optimizer sharding over the 8-device data axis
        must reproduce single-device numerics — GSPMD inserts the per-layer
        all-gathers / grad reduce-scatters."""
        cfg = tiny_cfg()
        model, state, tx = pretrain.create_train_state(
            cfg, jax.random.PRNGKey(9), total_steps=10)
        step_fn = pretrain.make_train_step(model, cfg, tx)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
            np.random.default_rng(9), cfg.data.in_domains, 8, 64).items()}

        s1, m1 = jax.jit(step_fn)(state, batch)

        mesh = mesh_lib.data_parallel_mesh()
        p_shard = shard_lib.fsdp_shardings(state.params, mesh, min_size=2 ** 8)
        # at least one param must actually be sharded for the test to bite
        assert any(
            s.spec != jax.sharding.PartitionSpec()
            for s in jax.tree.leaves(p_shard)
        )
        # TP + FSDP must COMPOSE: on a dp x tp mesh with model_axis given,
        # a column-parallel kernel keeps 'model' on its TP dim and gains
        # 'data' on a different dim
        mesh2 = mesh_lib.make_mesh((4, 2), ("data", "model"))
        both = shard_lib.fsdp_shardings(
            state.params, mesh2, min_size=2 ** 8, model_axis="model")
        specs = {
            "/".join(str(getattr(q, "key", q)) for q in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(both)[0]
        }
        tp_kernels = [v for k, v in specs.items() if k.endswith("to_kv/kernel")]
        assert tp_kernels and any(
            "model" in v and "data" in v for v in tp_kernels
        ), tp_kernels
        opt_shard = shard_lib.fsdp_shardings(state.opt_state, mesh, min_size=2 ** 8)
        repl = shard_lib.replicated(mesh)
        state_f = pretrain.TrainState(
            step=jax.device_put(state.step, repl),
            params=jax.tree.map(jax.device_put, state.params, p_shard),
            balancer_params=state.balancer_params,
            opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_shard),
            rng=jax.device_put(state.rng, repl),
        )
        batch_f = shard_lib.shard_batch(batch, mesh)
        s8, m8 = jax.jit(step_fn)(state_f, batch_f)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestPatchMajorBatch:
    def test_patch_major_loss_identical(self):
        """Host-emitted [B, N, p*p*C] batches (data.patchify_batch) must give
        bit-identical losses to image batches: host patchify is the same
        permutation the device would apply (ops.patches.patchify), so the
        adapter matmul and the patch-space loss see identical values."""
        from incomplete_multimodal_fusion_tpu.data import patchify_batch

        cfg = PretrainConfig(
            model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2,
                              ff_mult=2, num_fusion_tokens=16),
            data=DataConfig(input_size=64, batch_size=4),
            mask=MaskConfig(num_encoded_tokens=24),
        )
        model, state, tx = pretrain.create_train_state(
            cfg, jax.random.PRNGKey(0), total_steps=100)
        hb = synthetic_batch(np.random.default_rng(0), cfg.data.in_domains, 4, 64)
        b_img = {k: jnp.asarray(v) for k, v in hb.items()}
        b_pat = {k: jnp.asarray(v)
                 for k, v in patchify_batch(hb, cfg.data.patch_size).items()}
        assert b_pat["s1"].ndim == 3
        step = jax.jit(pretrain.make_train_step(model, cfg, tx))
        _, m1 = step(state, b_img)
        _, m2 = step(state, b_pat)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)

    def test_patch_major_semseg_passthrough(self):
        """Integer semantic maps pass through patchify_batch unchanged."""
        from incomplete_multimodal_fusion_tpu.data import patchify_batch

        hb = {"dnw": np.zeros((2, 64, 64), np.int32),
              "s2": np.zeros((2, 64, 64, 3), np.float32)}
        out = patchify_batch(hb, 16)
        assert out["dnw"].shape == (2, 64, 64)
        assert out["s2"].shape == (2, 16, 16 * 16 * 3)
