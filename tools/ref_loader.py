"""Load the PyTorch reference MultiMAE for parity tooling (torch required).

The pretraining zorro_utils.py ships a SyntaxError (full-width colon at
zorro_utils.py:255); the syntactically valid downstream copy is preloaded
under the package name before importing multimae_crossattn — same approach
as tests/golden/generate_fullmodel_golden.py.
"""
from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    """Returns (multimae_crossattn, input_adapters, output_adapters_simple,
    criterion) reference modules, shimmed to import cleanly."""
    if "refmm.multimae_crossattn" in sys.modules:
        return (
            sys.modules["refmm.multimae_crossattn"],
            sys.modules["refmm.input_adapters"],
            sys.modules["refmm.output_adapters_simple"],
            sys.modules["refmm.criterion"],
        )
    pkg = types.ModuleType("refmm")
    pkg.__path__ = [f"{REF}/pretraining/multimae"]
    sys.modules["refmm"] = pkg
    _load(
        "refmm.zorro_utils",
        f"{REF}/downstream/instance_segmentation/modeling/multimae/zorro_utils.py",
    )
    _load("refmm.multimae_utils", f"{REF}/pretraining/multimae/multimae_utils.py")
    ia = _load("refmm.input_adapters", f"{REF}/pretraining/multimae/input_adapters.py")
    oa = _load(
        "refmm.output_adapters_simple",
        f"{REF}/pretraining/multimae/output_adapters_simple.py",
    )
    mm = _load(
        "refmm.multimae_crossattn",
        f"{REF}/pretraining/multimae/multimae_crossattn.py",
    )
    crit = _load("refmm.criterion", f"{REF}/pretraining/multimae/criterion.py")
    return mm, ia, oa, crit


def build_reference_multimae(
    image_size: int = 64,
    patch_size: int = 16,
    dim_tokens: int = 64,
    depth: int = 2,
    dim_head: int = 16,
    heads: int = 2,
    ff_mult: int = 4,
    decoder_dim: int = 32,
    decoder_depth: int = 2,
    decoder_heads: int = 2,
    channels=None,
    seed: int = 0,
):
    """Build the reference flagship (crossattn) at a small config, mirroring
    pretrain_mmae.get_model (pretrain_mmae.py:188-248)."""
    import torch

    mm, ia, oa, _ = load_reference_modules()
    channels = channels or {"s1": 1, "s2": 3, "dem": 1}
    domains = tuple(channels.keys())
    torch.manual_seed(seed)
    input_adapters = {
        d: ia.PatchedInputAdapter(
            num_channels=channels[d], stride_level=1,
            patch_size_full=patch_size, image_size=image_size,
        )
        for d in domains
    }
    input_adapters["fusion"] = ia.FusionInputAdapter(
        num_channels=1, stride_level=1, patch_size_full=patch_size,
        image_size=image_size,
    )
    output_adapters = {
        d: oa.SpatialOutputAdapter(
            num_channels=channels[d], stride_level=1,
            patch_size_full=patch_size, image_size=image_size,
            dim_tokens=decoder_dim, depth=decoder_depth,
            num_heads=decoder_heads, use_task_queries=True, task=d,
            context_tasks=list(domains), use_xattn=True,
        )
        for d in domains
    }
    n_p = (image_size // patch_size) ** 2
    model = mm.MultiMAE(
        input_adapters=input_adapters,
        output_adapters=output_adapters,
        num_global_tokens=1,
        dim_tokens=dim_tokens,
        depth=depth,
        dim_head=dim_head,
        heads=heads,
        ff_mult=ff_mult,
        num_fusion_tokens=n_p,
        return_token_types=(
            mm.TokenTypes.S1, mm.TokenTypes.S2, mm.TokenTypes.DEM,
            mm.TokenTypes.FUSION,
        ),
        drop_path_rate=0.0,
        norm_layer=mm.LayerNorm,
    )
    return model
