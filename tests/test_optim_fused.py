"""flat_adamw (fused single-vector AdamW) must match the optax chain that
`create_optimizer(fused=False)` builds — same updates, same trajectories —
including the clip / skip-by-grad-norm / layer-decay / wd-mask semantics
(reference optim_factory.py:96-101, native_scaler.py:27-40)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.train import optim as optim_lib


def _params(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    return {
        "input_adapter_rgb": {"proj": {"kernel": jax.random.normal(ks[0], (12, 16)),
                                       "bias": jnp.zeros((16,))}},
        "block0": {"fc1": {"kernel": jax.random.normal(ks[1], (16, 32))},
                   "gamma": jnp.ones((16,))},
        "block3": {"fc2": {"kernel": jax.random.normal(ks[2], (32, 16))}},
        "pos_emb": jax.random.normal(ks[3], (1, 7, 16)) * 0.02,
        "head": {"kernel": jax.random.normal(ks[4], (16, 4))},
    }


def _grads(params, seed):
    k = jax.random.PRNGKey(100 + seed)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(k, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(kk, l.shape) for kk, l in zip(ks, leaves)]
    )


LR = lambda step: 1e-3 * (0.5 + 0.5 * jnp.cos(step / 10.0))
WD = lambda step: 0.05 * (1.0 - step / 100.0)


@pytest.mark.parametrize("clip,skip,ld", [
    (None, None, None),
    (1.0, None, None),
    (None, 3.0, None),
    (0.5, 3.0, 0.75),
])
def test_flat_adamw_matches_chain(clip, skip, ld):
    params = _params()
    kw = dict(betas=(0.9, 0.95), eps=1e-8, clip_grad=clip, skip_grad=skip,
              layer_decay=ld, num_layers=4)
    ref_tx = optim_lib.create_optimizer(params, LR, WD, fused=False, **kw)
    fus_tx = optim_lib.create_optimizer(params, LR, WD, fused=True, **kw)

    p_ref, p_fus = params, params
    s_ref, s_fus = ref_tx.init(p_ref), fus_tx.init(p_fus)
    ref_up = jax.jit(ref_tx.update)
    fus_up = jax.jit(fus_tx.update)
    for step in range(5):
        g = _grads(params, step)
        if skip is not None and step == 2:  # force a skip event
            g = jax.tree.map(lambda x: x * 100.0, g)
        u_ref, s_ref = ref_up(g, s_ref, p_ref)
        u_fus, s_fus = fus_up(g, s_fus, p_fus)
        for pa, pb in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_fus)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-5, atol=1e-7)
        import optax
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fus = optax.apply_updates(p_fus, u_fus)
    for pa, pb in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fus)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)


def test_flat_state_is_fsdp_shardable():
    """Moments are padded to a 1024 multiple so fsdp_shardings can split them."""
    params = _params()
    tx = optim_lib.flat_adamw(params, LR, WD)
    state = tx.init(params)
    assert state.mu.shape[0] % 1024 == 0
    assert state.nu.shape == state.mu.shape


def test_fused_pretrain_state_trains():
    """End-to-end: tiny pretrain with cfg.optim.fused_adamw=True steps and the
    loss stays finite (same recipe as tests/test_train.py)."""
    from incomplete_multimodal_fusion_tpu.config import (
        PretrainConfig, ModelConfig, DataConfig, MaskConfig, OptimConfig)
    from incomplete_multimodal_fusion_tpu.train import pretrain
    from incomplete_multimodal_fusion_tpu.data import synthetic

    cfg = PretrainConfig(
        model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2,
                          ff_mult=2, num_fusion_tokens=16),
        data=DataConfig(input_size=64, batch_size=2),
        mask=MaskConfig(num_encoded_tokens=24),
        optim=OptimConfig(clip_grad=1.0, skip_grad=10.0, fused_adamw=True),
    )
    model, state, tx = pretrain.create_train_state(cfg, jax.random.PRNGKey(0), 100)
    assert isinstance(state.opt_state, optim_lib.FlatAdamWState)
    step = jax.jit(pretrain.make_train_step(model, cfg, tx))
    batch = synthetic.synthetic_batch(
        np.random.default_rng(1), tuple(cfg.data.in_domains),
        cfg.data.batch_size, cfg.data.input_size)
    batch = jax.tree.map(jnp.asarray, batch)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
