"""Golden parity for models.layers.AttentionBiLSTM against the executed
reference AttentionBiLSTM/Attention_LSTM (downstream zorro_utils.py:261-299 —
torch nn.LSTM bidirectional + Linear-tanh attention pooling). Torch runs at
test time (importorskip), the reference module is loaded file-by-file.

Weight mapping (pinned here): torch LSTM packs gates (i, f, g, o) into
weight_ih/weight_hh [4D, D] with two bias vectors; flax LSTMCell keeps one
Dense per gate — input kernels bias-free, hidden kernels carrying the sum of
both torch biases."""
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from incomplete_multimodal_fusion_tpu.models.layers import AttentionBiLSTM

REF = ("/root/reference/downstream/instance_segmentation/modeling/multimae/"
       "zorro_utils.py")


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_zorro_lstm", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cell_params(w_ih, w_hh, b_ih, b_hh, d):
    gates = {"i": 0, "f": 1, "g": 2, "o": 3}
    p = {}
    for g, idx in gates.items():
        sl = slice(idx * d, (idx + 1) * d)
        p[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[sl].T)}
        p[f"h{g}"] = {"kernel": np.ascontiguousarray(w_hh[sl].T),
                      "bias": b_ih[sl] + b_hh[sl]}
    return p


def test_attention_bilstm_golden():
    ref = _load_ref()
    d, n, m = 16, 3, 4
    torch.manual_seed(5)
    model = ref.AttentionBiLSTM(d).eval()
    x = np.random.default_rng(0).standard_normal((n, m, d)).astype(np.float32)
    with torch.no_grad():
        out_ref = model(torch.from_numpy(x)).numpy()

    s = {k: v.numpy() for k, v in model.state_dict().items()}
    params = {
        "lstm_fwd": _cell_params(s["lstm.weight_ih_l0"], s["lstm.weight_hh_l0"],
                                 s["lstm.bias_ih_l0"], s["lstm.bias_hh_l0"], d),
        "lstm_bwd": _cell_params(s["lstm.weight_ih_l0_reverse"],
                                 s["lstm.weight_hh_l0_reverse"],
                                 s["lstm.bias_ih_l0_reverse"],
                                 s["lstm.bias_hh_l0_reverse"], d),
        "attention": {"kernel": s["attention.attention.weight"].T,
                      "bias": s["attention.attention.bias"]},
    }
    params = jax.tree.map(jnp.asarray, params)

    out = AttentionBiLSTM().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-5, atol=1e-5)
