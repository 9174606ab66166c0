"""FLAGSHIP-DIM pretraining forward parity vs the executed PyTorch
reference (round-3 verdict ask #6): the exact config `__graft_entry__.entry()`
and bench.py run — 192d / 12L / heads 3 / 256 fusion tokens at 256², 384
encoded tokens (multimae_crossattn.py:548-563 factory dims) — transplanted
whole and asserted equal. The shrunken-config fixture
(tests/test_fullmodel_parity.py) pins the math; this pins the dims where
the Pallas kernels engage on TPU (here compared on the XLA path, fp32).

torch executes the reference at test time (like
tests/test_full_maskformer_parity.py); the pretraining zorro_utils.py ships
a SyntaxError (full-width colon, :255) so the valid downstream copy is
preloaded under the package name — the golden generators' approach."""
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REF = "/root/reference"
DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
IMG, PATCH = 256, 16
NP_MOD = (IMG // PATCH) ** 2  # 256
DIM, DEPTH, DIM_HEAD, HEADS, FF = 192, 12, 64, 3, 4
DEC_DIM, DEC_DEPTH, DEC_HEADS = 256, 2, 8
E = 384


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_reference():
    pkg = types.ModuleType("refflag")
    pkg.__path__ = [f"{REF}/pretraining/multimae"]
    sys.modules["refflag"] = pkg
    _load("refflag.zorro_utils",
          f"{REF}/downstream/instance_segmentation/modeling/multimae/"
          "zorro_utils.py")
    _load("refflag.multimae_utils",
          f"{REF}/pretraining/multimae/multimae_utils.py")
    ia = _load("refflag.input_adapters",
               f"{REF}/pretraining/multimae/input_adapters.py")
    oa = _load("refflag.output_adapters_simple",
               f"{REF}/pretraining/multimae/output_adapters_simple.py")
    mm = _load("refflag.multimae_crossattn",
               f"{REF}/pretraining/multimae/multimae_crossattn.py")
    return ia, oa, mm


def test_flagship_dims_forward_parity():
    from incomplete_multimodal_fusion_tpu.models.multimae import MultiMAE
    from incomplete_multimodal_fusion_tpu.ops import masking
    from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
        convert_multimae_state)

    ia, oa, mm = _load_reference()
    torch.manual_seed(20260819)
    input_adapters = {
        d: ia.PatchedInputAdapter(
            num_channels=CHANNELS[d], stride_level=1, patch_size_full=PATCH,
            image_size=IMG)
        for d in DOMAINS
    }
    input_adapters["fusion"] = ia.FusionInputAdapter(
        num_channels=1, stride_level=1, patch_size_full=PATCH, image_size=IMG)
    output_adapters = {
        d: oa.SpatialOutputAdapter(
            num_channels=CHANNELS[d], stride_level=1, patch_size_full=PATCH,
            image_size=IMG, dim_tokens=DEC_DIM, depth=DEC_DEPTH,
            num_heads=DEC_HEADS, use_task_queries=True, task=d,
            context_tasks=list(DOMAINS), use_xattn=True)
        for d in DOMAINS
    }
    ref = mm.MultiMAE(
        input_adapters=input_adapters, output_adapters=output_adapters,
        num_global_tokens=1, dim_tokens=DIM, depth=DEPTH, dim_head=DIM_HEAD,
        heads=HEADS, ff_mult=FF, num_fusion_tokens=NP_MOD,
        return_token_types=(mm.TokenTypes.S1, mm.TokenTypes.S2,
                            mm.TokenTypes.DEM, mm.TokenTypes.FUSION),
        drop_path_rate=0.0, norm_layer=mm.LayerNorm,
    ).eval()

    rng = np.random.default_rng(42)
    b = 1
    x = {d: rng.normal(size=(b, CHANNELS[d], IMG, IMG)).astype(np.float32)
         for d in DOMAINS}
    # 384 of 768 visible, dem partially dropped (150+150+84)
    vis = {d: np.zeros(NP_MOD, bool) for d in DOMAINS}
    vis["s1"][rng.permutation(NP_MOD)[:150]] = True
    vis["s2"][rng.permutation(NP_MOD)[:150]] = True
    vis["dem"][rng.permutation(NP_MOD)[:84]] = True
    task_masks = {
        d: torch.from_numpy((~vis[d]).astype(np.int64))[None].repeat(b, 1)
        for d in DOMAINS
    }
    with torch.no_grad():
        preds, _tm, ret, ori, fus, r_s1, r_s2, r_dem = ref.forward(
            {d: torch.from_numpy(x[d]) for d in DOMAINS},
            mask_inputs=True, task_masks=task_masks, num_encoded_tokens=E)

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_multimae_state(
        state, DOMAINS, DOMAINS, CHANNELS, patch_size=PATCH, depth=DEPTH,
        decoder_depth=DEC_DEPTH)

    model = MultiMAE(
        in_domains=DOMAINS, out_domains=DOMAINS, image_size=IMG,
        patch_size=PATCH, dim_tokens=DIM, depth=DEPTH, dim_head=DIM_HEAD,
        heads=HEADS, ff_mult=FF, num_fusion_tokens=NP_MOD,
        fusion_mode="crossattn", attn_impl="xla", decoder_dim=DEC_DIM,
        decoder_depth=DEC_DEPTH, decoder_num_heads=DEC_HEADS)
    xj = {d: jnp.asarray(v.transpose(0, 2, 3, 1)) for d, v in x.items()}
    tm = {d: jnp.asarray(task_masks[d].numpy()) for d in DOMAINS}
    mi = masking.mask_info_from_task_masks(tm, DOMAINS, E)
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      xj, mi, E)

    for d in DOMAINS:
        np.testing.assert_allclose(
            np.asarray(out["preds"][d]), preds[d].numpy().transpose(0, 2, 3, 1),
            atol=2e-3, rtol=2e-3, err_msg=f"pred[{d}]")
    np.testing.assert_allclose(np.asarray(out["pooled"]), ret.numpy(),
                               atol=2e-3, rtol=2e-3, err_msg="return tokens")
    np.testing.assert_allclose(np.asarray(out["fusion_tokens"]), fus.numpy(),
                               atol=2e-3, rtol=2e-3, err_msg="fusion stream")
    np.testing.assert_allclose(
        np.asarray(out["ori_tokens"]), ori.numpy(), atol=2e-3, rtol=2e-3,
        err_msg="packed visible tokens")
    for d, r in zip(DOMAINS, (r_s1, r_s2, r_dem)):
        np.testing.assert_allclose(
            np.asarray(out["pooled_mod"][d]), r.numpy()[:, 0, :],
            atol=2e-3, rtol=2e-3, err_msg=f"pool[{d}]")
