"""FULL downstream-model transplant parity: the reference MaskFormerModel
(modeling/MaskFormerModel_vit.py — ViTMAE backbone + MaskFormerHead
{MSDeformAttnPixelDecoder, MultiScaleMaskedTransformerDecoder}) executed
torch-CPU, its entire state dict converted via
utils.torch_convert.convert_maskformer_state, and the jax MaskFormerModel
asserted equal on the same inputs. One test pins the whole downstream stack
end-to-end, composition included.

The backbone is the reference's hardcoded flagship (192d / 12L / 256 fusion
tokens at 256^2 — multimae_big_imcomplete.py:778-791); head dims are
cfg-driven and kept small. Torch runs at test time (importorskip)."""
import importlib.util
import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

MODELING = "/root/reference/downstream/instance_segmentation/modeling"


class AttrDict(dict):
    __getattr__ = dict.__getitem__


def _stub_deps():
    if "fvcore" not in sys.modules:
        wi = types.ModuleType("fvcore.nn.weight_init")

        def c2_xavier_fill(module):
            torch.nn.init.kaiming_uniform_(module.weight, a=1)
            if module.bias is not None:
                torch.nn.init.constant_(module.bias, 0)

        wi.c2_xavier_fill = c2_xavier_fill
        fv, fvnn = types.ModuleType("fvcore"), types.ModuleType("fvcore.nn")
        fvnn.weight_init = wi
        fv.nn = fvnn
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.nn"] = fvnn
        sys.modules["fvcore.nn.weight_init"] = wi
    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")
        addict.Dict = AttrDict
        sys.modules["addict"] = addict


def _add_pkg(name, path):
    m = types.ModuleType(name)
    m.__path__ = [path]
    sys.modules[name] = m


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_reference_model():
    _stub_deps()
    _add_pkg("reffull", MODELING)
    _add_pkg("reffull.multimae", f"{MODELING}/multimae")
    _add_pkg("reffull.transformer_decoder", f"{MODELING}/transformer_decoder")
    _add_pkg("reffull.pixel_decoder", f"{MODELING}/pixel_decoder")
    _add_pkg("reffull.pixel_decoder.ops", f"{MODELING}/pixel_decoder/ops")
    _add_pkg("reffull.pixel_decoder.ops.functions",
             f"{MODELING}/pixel_decoder/ops/functions")
    _add_pkg("reffull.pixel_decoder.ops.modules",
             f"{MODELING}/pixel_decoder/ops/modules")
    _load("reffull.multimae.multimae_utils",
          f"{MODELING}/multimae/multimae_utils.py")
    _load("reffull.multimae.zorro_utils", f"{MODELING}/multimae/zorro_utils.py")
    _load("reffull.multimae.input_adapters",
          f"{MODELING}/multimae/input_adapters.py")
    _load("reffull.multimae.multimae_big_imcomplete",
          f"{MODELING}/multimae/multimae_big_imcomplete.py")
    _load("reffull.transformer_decoder.position_encoding",
          f"{MODELING}/transformer_decoder/position_encoding.py")
    _load("reffull.transformer_decoder.transformer",
          f"{MODELING}/transformer_decoder/transformer.py")
    _load("reffull.transformer_decoder.mask2former_transformer_decoder",
          f"{MODELING}/transformer_decoder/mask2former_transformer_decoder.py")
    _load("reffull.pixel_decoder.ops.functions.ms_deform_attn_func",
          f"{MODELING}/pixel_decoder/ops/functions/ms_deform_attn_func.py")
    msda = _load("reffull.pixel_decoder.ops.modules.ms_deform_attn",
                 f"{MODELING}/pixel_decoder/ops/modules/ms_deform_attn.py")
    sys.modules["reffull.pixel_decoder.ops.modules"].MSDeformAttn = (
        msda.MSDeformAttn)
    _load("reffull.pixel_decoder.msdeformattn_vit",
          f"{MODELING}/pixel_decoder/msdeformattn_vit.py")
    return _load("reffull.MaskFormerModel_vit",
                 f"{MODELING}/MaskFormerModel_vit.py")


def _cfg(num_classes, conv_dim, hidden_dim, queries, enc_layers, dec_layers_repo):
    return AttrDict({
        "MultiMAE": AttrDict({
            "patch_size": 16, "input_size": 256, "drop_path": 0.0,
            "in_domains": ["s1", "s2", "dem"], "extra_fusion_token": True,
        }),
        "MODEL": AttrDict({
            "BACKBONE": AttrDict({"PRETRAINED_WEIGHTS": ""}),
            "SEM_SEG_HEAD": AttrDict({
                "COMMON_STRIDE": 4, "TRANSFORMER_ENC_LAYERS": enc_layers,
                "CONVS_DIM": conv_dim, "MASK_DIM": conv_dim,
                "NUM_CLASSES": num_classes,
                "DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES":
                    ["res3", "res4", "res5"],
            }),
            "MASK_FORMER": AttrDict({
                "DROPOUT": 0.0, "NHEADS": 8, "HIDDEN_DIM": hidden_dim,
                "NUM_OBJECT_QUERIES": queries, "DIM_FEEDFORWARD": 256,
                "DEC_LAYERS": dec_layers_repo + 1, "PRE_NORM": False,
            }),
        }),
    })


def test_full_maskformer_transplant():
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel)
    from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
        convert_maskformer_state)

    mm = _load_reference_model()
    K, CONV, QUERIES, ENC, DEC = 3, 64, 10, 1, 3
    torch.manual_seed(77)
    ref = mm.MaskFormerModel(_cfg(K, CONV, CONV, QUERIES, ENC, DEC)).eval()
    # Push mask logits away from 0: at random init sigmoid(mask) sits at
    # ~0.5, so the predictor's hard attn-mask threshold flips on fp noise
    # and the comparison measures chaos, not parity. Scaling the mask-embed
    # output layer (a legitimate weight choice) moves logits off the
    # threshold; real trained checkpoints are decisive in the same way.
    with torch.no_grad():
        ref.sem_seg_head.predictor.mask_embed.layers[2].weight *= 6.0
        ref.sem_seg_head.predictor.mask_embed.layers[2].bias *= 6.0

    rng = np.random.default_rng(20260818)
    x = {d: rng.standard_normal((1, c, 256, 256)).astype(np.float32)
         for d, c in (("s1", 1), ("s2", 3), ("dem", 1))}
    with torch.no_grad():
        out_ref = ref({d: torch.from_numpy(v) for d, v in x.items()})

    state = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_maskformer_state(
        state, ("s1", "s2", "dem"), depth=12, enc_layers=ENC,
        dec_layers=DEC, hidden_dim=CONV)
    params = jax.tree.map(jnp.asarray, params)

    cfg = MaskFormerConfig(
        num_classes=K, conv_dim=CONV, mask_dim=CONV,
        transformer_enc_layers=ENC, num_queries=QUERIES, dec_layers=DEC,
        dim_feedforward=256,
    )
    model = MaskFormerModel(cfg)
    xj = {d: jnp.asarray(v.transpose(0, 2, 3, 1)) for d, v in x.items()}
    out = model.apply({"params": params}, xj)

    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               out_ref["pred_logits"].numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               out_ref["pred_masks"].numpy(),
                               rtol=2e-3, atol=2e-3)
    assert len(out["aux_outputs"]) == len(out_ref["aux_outputs"])
