"""Serving export (serving.py): the serialized StableHLO artifact must
reload and reproduce the live forward exactly, including modality dropout —
the deployment path the reference lacks (its inference is the infer_mmae.py
script rebuilding the torch model per run)."""
import jax
import jax.numpy as jnp
import numpy as np

from incomplete_multimodal_fusion_tpu import serving
from incomplete_multimodal_fusion_tpu.config import (
    DataConfig, DecoderConfig, MaskConfig, ModelConfig, PretrainConfig,
    TrainConfig,
)
from incomplete_multimodal_fusion_tpu.models.multimae import build_multimae
from incomplete_multimodal_fusion_tpu.ops import masking
from incomplete_multimodal_fusion_tpu.train import pretrain


def _tiny():
    return PretrainConfig(
        model=ModelConfig(dim_tokens=32, depth=2, dim_head=8, heads=2,
                          ff_mult=2, num_fusion_tokens=16),
        data=DataConfig(input_size=64, batch_size=2),
        mask=MaskConfig(num_encoded_tokens=24),
        decoder=DecoderConfig(dim=32, depth=1, num_heads=2),
        train=TrainConfig(compute_dtype="float32"),
    )


def test_export_roundtrip_matches_live_forward(tmp_path):
    cfg = _tiny()
    model = build_multimae(cfg)
    params = pretrain.init_model(model, cfg, jax.random.PRNGKey(0))
    domains = tuple(cfg.data.in_domains)
    n = model.num_patches
    b = 1

    blob = serving.export_infer(model, params, batch=b, image_size=64)
    assert isinstance(blob, bytes) and len(blob) > 0
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)
    serve = serving.load_exported(path.read_bytes())

    rng = np.random.default_rng(0)
    ch = {"s1": 1, "s2": 3, "dem": 1}
    xs = [jnp.asarray(rng.normal(size=(b, 64, 64, ch[d])), jnp.float32)
          for d in domains]
    # drop the s2 modality entirely (the headline incomplete-fusion case)
    masks = [jnp.full((b, n), 1 if d == "s2" else 0, jnp.int32)
             for d in domains]

    out = serve(*xs, *masks)

    x = dict(zip(domains, xs))
    task_masks = dict(zip(domains, masks))
    e = n * len(domains)
    mi = masking.mask_info_from_task_masks(task_masks, domains, e)
    ref = model.apply({"params": params}, x, mi, e)

    for d in domains:
        np.testing.assert_allclose(
            np.asarray(out["preds"][d]), np.asarray(ref["preds"][d]),
            atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), np.asarray(ref["pooled"]), atol=1e-5)
