"""scripts/convert_checkpoint.py: reference .pth -> orbax roundtrip, using
the frozen reference weights from tests/golden/fullmodel_golden.npz (the same
tensors test_fullmodel_parity.py pins bit-parity with)."""
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

G = dict(np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "fullmodel_golden.npz")))


def test_cli_roundtrip(tmp_path):
    import scripts.convert_checkpoint as cc
    from incomplete_multimodal_fusion_tpu.utils import checkpoint as ckpt_lib
    from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
        convert_multimae_state)

    state = {k[len("w::"):]: torch.from_numpy(v)
             for k, v in G.items() if k.startswith("w::")}
    pth = str(tmp_path / "ref.pth")
    torch.save({"model": state}, pth)
    out = str(tmp_path / "ckpt")

    cc.main([pth, out, "--in_domains", "s1-s2-dem",
             "--depth", "2", "--decoder_depth", "2"])

    ref = convert_multimae_state(
        {k[len("w::"):]: v for k, v in G.items() if k.startswith("w::")},
        ("s1", "s2", "dem"), ("s1", "s2", "dem"),
        {"s1": 1, "s2": 3, "dem": 1}, depth=2, decoder_depth=2)
    restored = ckpt_lib.restore_checkpoint(out, {"params": ref})
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
