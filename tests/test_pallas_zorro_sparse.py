"""Parity tests for ops/pallas_zorro_sparse.py — block-sparse zorro
attention over 128-token type tiles (vs the dense packed-qkv XLA math).

The sparse predicate is conservative for *valid* rows; PAD query rows are
dead outputs (never read by the model: the packed layout puts padding at
the tail and downstream gathers only valid slots), so parity is asserted
on valid rows and gradients flow through a valid-row-masked loss.
"""
import jax
import jax.numpy as jnp
import numpy as np

from incomplete_multimodal_fusion_tpu.ops.pallas_attn import (
    PAD_TYPE,
    _packed_qkv_xla,
)
from incomplete_multimodal_fusion_tpu.ops.pallas_zorro_sparse import (
    TILE,
    tile_active,
    zorro_sparse_attention_qkv,
    zorro_sparse_supported,
)


def packed_types(b, n, blocks, fusion_type):
    """Packed-contiguous type layout like the real model: per-type blocks
    in type order, fusion block, PAD tail. blocks: [(type, count), ...]."""
    row = []
    for t, c in blocks:
        row += [t] * c
    assert len(row) <= n
    row += [PAD_TYPE] * (n - len(row))
    return jnp.asarray(np.tile(np.asarray(row, np.int32), (b, 1)))


def _parity_case(seed, b, n, h, dh, blocks, fusion_type):
    rng = np.random.default_rng(seed)
    inner = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * inner)), jnp.float32)
    types = packed_types(b, n, blocks, fusion_type)
    valid = np.asarray(types[0]) != PAD_TYPE

    out = zorro_sparse_attention_qkv(qkv, types, h, fusion_type)
    ref = _packed_qkv_xla(qkv, types, h, fusion_type, dh ** -0.5)
    np.testing.assert_allclose(np.asarray(out)[:, valid],
                               np.asarray(ref)[:, valid], atol=3e-5)

    w = jnp.asarray(valid, jnp.float32)[None, :, None]

    def loss(fn, qkv):
        return jnp.sum(jnp.sin(fn(qkv)) * w)

    g_pl = jax.grad(lambda x: loss(
        lambda q: zorro_sparse_attention_qkv(q, types, h, fusion_type), x))(qkv)
    g_ref = jax.grad(lambda x: loss(
        lambda q: _packed_qkv_xla(q, types, h, fusion_type, dh ** -0.5), x))(qkv)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=5e-5)
    return types


def test_flagship_shape_parity():
    # s1+s2 pretrain: E=384 visible + F=256 fusion = 640 = 5 tiles
    _parity_case(0, 2, 5 * TILE, 3, 64,
                 [(0, 192), (1, 192), (3, 256)], fusion_type=3)


def test_sparse_tiles_actually_skipped():
    # single-type blocks per tile -> off-diagonal modality tiles are dead
    types = _parity_case(1, 1, 4 * TILE,
                         2, 64, [(0, TILE), (1, TILE), (2, TILE), (3, TILE)],
                         fusion_type=3)
    act = np.asarray(tile_active(types.astype(jnp.int32), 3, 4)).reshape(4, 4)
    # modality rows keep only their diagonal; fusion row all on
    assert act.sum() < 16
    assert (act[3] == 1).all()
    assert act[0, 1] == 0 and act[1, 2] == 0


def test_padded_tail_parity():
    # quadruplet-ish with a pure-PAD final tile
    _parity_case(2, 2, 6 * TILE, 2, 32,
                 [(0, 100), (1, 100), (2, 100), (3, 100), (4, 256)],
                 fusion_type=4)


def test_supported_gate():
    assert zorro_sparse_supported(640)    # flagship
    assert zorro_sparse_supported(768)
    assert not zorro_sparse_supported(128)   # 1 tile: dense is fine
    assert not zorro_sparse_supported(644)   # not 128-aligned
    assert not zorro_sparse_supported(1024)  # nt=8: unroll/compile bound
