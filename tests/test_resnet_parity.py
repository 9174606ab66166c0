"""Golden parity for models/resnet.py against the executed reference ResNet
(downstream/instance_segmentation/modeling/backbone/resnet.py:127-185,
torch + a stubbed `addict`). Torch runs at test time (importorskip).

The BN fold is exercised with RANDOMIZED running statistics (not the fresh
mean-0/var-1 init): FrozenBatchNorm keeps only (scale, bias), so the
transplant folds running stats in — scale' = w/sqrt(var+eps),
bias' = b - mean*scale'."""
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from incomplete_multimodal_fusion_tpu.models.resnet import ResNet

REF = ("/root/reference/downstream/instance_segmentation/modeling/backbone/"
       "resnet.py")


def _load_ref():
    if "addict" not in sys.modules:
        addict = types.ModuleType("addict")
        addict.Dict = dict
        sys.modules["addict"] = addict
    spec = importlib.util.spec_from_file_location("ref_resnet", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fold_bn(s, p, eps=1e-5):
    w, b = s[f"{p}.weight"], s[f"{p}.bias"]
    mean, var = s[f"{p}.running_mean"], s[f"{p}.running_var"]
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _conv(s, p):
    return {"kernel": np.ascontiguousarray(s[f"{p}.weight"].transpose(2, 3, 1, 0))}


def _basic_block(s, p):
    out = {"conv1": _conv(s, f"{p}.conv1"), "bn1": _fold_bn(s, f"{p}.bn1"),
           "conv2": _conv(s, f"{p}.conv2"), "bn2": _fold_bn(s, f"{p}.bn2")}
    if f"{p}.downsample.0.weight" in s:
        out["downsample_conv"] = _conv(s, f"{p}.downsample.0")
        out["downsample_bn"] = _fold_bn(s, f"{p}.downsample.1")
    return out


def test_resnet18_golden():
    ref = _load_ref()
    torch.manual_seed(9)
    model = ref.ResNet(ref.BasicBlock, [2, 2, 2, 2])
    # randomize BN running stats so the fold is actually tested
    gen = np.random.default_rng(1)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    gen.standard_normal(m.num_features).astype(np.float32) * 0.5))
                m.running_var.copy_(torch.from_numpy(
                    0.5 + gen.random(m.num_features).astype(np.float32)))
    model.eval()
    x = gen.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs = model(torch.from_numpy(x))

    s = {k: v.numpy() for k, v in model.state_dict().items()}
    params = {"conv1": _conv(s, "conv1"), "bn1": _fold_bn(s, "bn1")}
    for stage, n_blocks in enumerate([2, 2, 2, 2]):
        for b in range(n_blocks):
            params[f"layer{stage + 1}_{b}"] = _basic_block(
                s, f"layer{stage + 1}.{b}")
    params = jax.tree.map(jnp.asarray, params)

    feats = ResNet(depth=18).apply({"params": params},
                                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    for i, key in enumerate(["res2", "res3", "res4", "res5"]):
        ref_f = outs[key].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(feats[i]), ref_f,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"level {key}")
