"""VMEM feasibility guards for wide geometries (round 5).

The Pallas kernels were tuned for the tiny-class shapes; at base-class
widths their resident weights / f32 grad accumulators / slab working sets
exceed the 16 MB scoped VMEM (observed as Mosaic scoped-vmem OOMs when
`base_tpu` first compiled). These tests pin the routing decisions: the
kernels keep serving every shape they served before, and decline exactly
the infeasible ones so the XLA fallbacks take over.
"""
import jax

jax.config.update("jax_platforms", "cpu")

from incomplete_multimodal_fusion_tpu.ops.pallas_attn import (  # noqa: E402
    attn_vmem_ok, pallas_supported, resolve_attn_mode,
)
from incomplete_multimodal_fusion_tpu.ops.pallas_ffn import (  # noqa: E402
    ffn_supported, mlp_supported,
)


class TestFFNGuards:
    def test_flagship_shapes_stay_on_kernel(self):
        # encoder M=38400 and fusion M=15360 at 192d / gi=512, bf16
        assert ffn_supported(38400, 192, 512, itemsize=2)
        assert ffn_supported(15360, 192, 512, itemsize=2)

    def test_tiny_tpu_stays_on_kernel(self):
        # 256d, gi = int(256*4*2/3) = 682
        assert ffn_supported(38400, 256, int(256 * 4 * 2 / 3), itemsize=2)

    def test_base_width_declines(self):
        # 768d / gi=2048: f32 weight-grad accumulators alone ~19 MB
        assert not ffn_supported(38400, 768, 2048, itemsize=2)

    def test_f32_trace_declines_earlier_than_bf16(self):
        # the flax init trace runs f32 through the same routing branch;
        # a shape near the bf16 boundary must decline at itemsize=4
        d, gi = 512, 1366
        bf16_ok = ffn_supported(38400, d, gi, itemsize=2)
        f32_ok = ffn_supported(38400, d, gi, itemsize=4)
        assert (not f32_ok) or bf16_ok  # f32 is never MORE permissive

    def test_decoder_mlp_stays_on_kernel(self):
        assert mlp_supported(15360, 1024, 256, itemsize=2)

    def test_wide_mlp_declines(self):
        assert not mlp_supported(15360, 4 * 768, 768, itemsize=2)


class TestAttnGuards:
    def test_flagship_slab_ok(self):
        assert attn_vmem_ok(640, 192)
        assert pallas_supported(640, 192)

    def test_tiny_tpu_slab_ok(self):
        assert attn_vmem_ok(640, 256)

    def test_base_width_declines(self):
        assert not attn_vmem_ok(640, 768)
        assert not pallas_supported(640, 768)

    def test_resolve_attn_mode_routes_wide_to_xla(self):
        assert resolve_attn_mode("auto", 640, 192) == "auto"
        assert resolve_attn_mode("auto", 640, 768) is False
        # explicit 'pallas' stays forced (caller's responsibility)
        assert resolve_attn_mode("pallas", 640, 768) is True

    def test_inner_omitted_keeps_legacy_behavior(self):
        assert pallas_supported(640)
        assert pallas_supported(1280)  # q-tiled path
        assert not pallas_supported(5000)
