"""Real-TIFF ingestion through the full DFC2023 pipeline (round-3 verdict
Do#5): synthesize actual TIFF files, run load+norm+crop+batch on them, and
cross-check the builtin baseline-TIFF codec against independently produced
TIFF bytes (PIL). Reference path being covered:
multimodal_dfc2023.py:99-141 (per-modality load+normalize) and :180-238
(dataset + DataLoader)."""
import os

import numpy as np
import pytest

from incomplete_multimodal_fusion_tpu.data import dfc2023
from incomplete_multimodal_fusion_tpu.data.tiff import read_tiff, write_tiff


def _write_tree(root, n=4, size=256, writer=write_tiff):
    """DFC2023-layout tree of real TIFFs: uint8 RGB, float32 SAR/DSM."""
    rng = np.random.default_rng(0)
    for sub in ("rgb", "sar", "dsm"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    raw = []
    for i in range(n):
        rgb = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        sar = rng.uniform(0.0, 2.0, (size, size)).astype(np.float32)
        dsm = rng.uniform(-3.0, 40.0, (size, size)).astype(np.float32)
        writer(os.path.join(root, "rgb", f"t{i}.tiff"), rgb)
        writer(os.path.join(root, "sar", f"t{i}.tiff"), sar)
        writer(os.path.join(root, "dsm", f"t{i}.tiff"), dsm)
        raw.append((rgb, sar, dsm))
    return raw


class TestBuiltinCodec:
    @pytest.mark.parametrize("dtype,shape", [
        (np.uint8, (31, 17, 3)), (np.uint16, (8, 8)), (np.int16, (5, 9)),
        (np.float32, (16, 16)), (np.float32, (12, 7, 4)), (np.float64, (4, 4)),
    ])
    def test_roundtrip(self, tmp_path, dtype, shape):
        rng = np.random.default_rng(1)
        if np.issubdtype(dtype, np.integer):
            arr = rng.integers(0, np.iinfo(dtype).max, shape).astype(dtype)
        else:
            arr = rng.standard_normal(shape).astype(dtype)
        p = str(tmp_path / "x.tiff")
        write_tiff(p, arr)
        back = read_tiff(p)
        np.testing.assert_array_equal(back.reshape(arr.shape), arr)

    def test_reads_pil_produced_bytes(self, tmp_path):
        """Decode TIFF bytes produced by an independent encoder (PIL):
        uint8 RGB and float32 single-band — the two DFC2023 raster kinds."""
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(2)
        rgb = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
        p1 = str(tmp_path / "rgb.tiff")
        PIL.fromarray(rgb).save(p1)  # PIL default: uncompressed strips
        np.testing.assert_array_equal(read_tiff(p1), rgb)

        dsm = rng.standard_normal((33, 21)).astype(np.float32)
        p2 = str(tmp_path / "dsm.tiff")
        PIL.fromarray(dsm, mode="F").save(p2)
        np.testing.assert_array_equal(read_tiff(p2), dsm)

    def test_big_endian_and_planar(self, tmp_path):
        """Hand-build an MM (big-endian) planar-config-2 file and decode."""
        import struct

        arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(3, 4, 2)
        h, w, spp = arr.shape
        planes = arr.transpose(2, 0, 1).tobytes()
        tags = [
            (256, 4, 1, (w,)), (257, 4, 1, (h,)), (258, 3, 2, (8, 8)),
            (259, 3, 1, (1,)), (273, 4, 2, None), (277, 3, 1, (spp,)),
            (279, 4, 2, (h * w, h * w)), (284, 3, 1, (2,)),
            (339, 3, 2, (1, 1)),
        ]
        ifd_off = 8
        n = len(tags)
        extra_off = ifd_off + 2 + 12 * n + 4
        extra = b""
        entries = b""
        patches = []
        for t, ft, cnt, vals in tags:
            code = {3: "H", 4: "I"}[ft]
            size = {3: 2, 4: 4}[ft]
            if t == 273:
                patches.append(extra_off + len(extra))
                extra += struct.pack(">II", 0, 0)  # patched after layout
                vb = struct.pack(">I", patches[0])
            elif size * cnt <= 4:
                vb = struct.pack(">" + code * cnt, *vals).ljust(4, b"\0")
            else:
                vb = struct.pack(">I", extra_off + len(extra))
                extra += struct.pack(">" + code * cnt, *vals)
            entries += struct.pack(">HHI", t, ft, cnt) + vb
        pix_off = extra_off + len(extra)
        blob = bytearray(
            struct.pack(">2sHI", b"MM", 42, ifd_off)
            + struct.pack(">H", n) + entries + struct.pack(">I", 0)
            + extra + planes
        )
        struct.pack_into(">II", blob, patches[0], pix_off, pix_off + h * w)
        p = str(tmp_path / "mm.tiff")
        with open(p, "wb") as f:
            f.write(bytes(blob))
        np.testing.assert_array_equal(read_tiff(p), arr)

    def test_unsupported_compression_raises_clear_error(self, tmp_path):
        """JPEG-in-TIFF stays out of scope — must raise, not mis-decode."""
        PIL = pytest.importorskip("PIL.Image")
        rgb = np.zeros((16, 16, 3), np.uint8)
        p = str(tmp_path / "jpg.tiff")
        PIL.fromarray(rgb).save(p, compression="jpeg")
        with pytest.raises(ValueError, match="compression"):
            read_tiff(p)


class TestCompressedCodec:
    """Deflate / packbits / LZW (+ horizontal-differencing predictor) —
    the compressions real DFC2023-style GeoTIFF trees use (the reference
    reads them via rasterio, multimodal_dfc2023.py:99-141; round-4 verdict
    Missing #4)."""

    @pytest.mark.parametrize("comp", ["deflate", "packbits", "lzw"])
    @pytest.mark.parametrize("pred", [1, 2])
    @pytest.mark.parametrize("dtype,shape", [
        (np.uint8, (37, 41, 3)), (np.uint16, (16, 23)),
        (np.int32, (33, 17)), (np.float32, (20, 20)),
    ])
    def test_roundtrip(self, tmp_path, comp, pred, dtype, shape):
        if pred == 2 and np.issubdtype(dtype, np.floating):
            pytest.skip("predictor=2 is integer-only")
        rng = np.random.default_rng(3)
        if np.issubdtype(dtype, np.integer):
            arr = rng.integers(np.iinfo(dtype).min // 2,
                               np.iinfo(dtype).max // 2, shape).astype(dtype)
        else:
            arr = rng.standard_normal(shape).astype(dtype)
        p = str(tmp_path / "x.tiff")
        write_tiff(p, arr, compression=comp, predictor=pred)
        np.testing.assert_array_equal(read_tiff(p).reshape(arr.shape), arr)

    def test_lzw_width_bumps_and_table_clear(self, tmp_path):
        """Big-enough raster to cross every LZW code-width boundary (9→12
        bits) and force a mid-stream table clear."""
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (300, 257, 3)).astype(np.uint8)
        p = str(tmp_path / "big.tiff")
        write_tiff(p, arr, compression="lzw")
        np.testing.assert_array_equal(read_tiff(p), arr)

    @pytest.mark.parametrize("pilcomp,ours", [
        ("tiff_adobe_deflate", "deflate"), ("packbits", "packbits"),
        ("tiff_lzw", "lzw"),
    ])
    def test_cross_validated_against_libtiff(self, tmp_path, pilcomp, ours):
        """Decode libtiff-encoded strips (via PIL) AND have libtiff decode
        ours — independent-implementation agreement in both directions.
        Multi-strip: libtiff splits ~8 KB strips, each its own stream."""
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (450, 520, 3)).astype(np.uint8)
        img[:200] = 7  # long runs + noise: exercises RLE and LZW clears
        p1 = str(tmp_path / "libtiff.tiff")
        PIL.fromarray(img).save(p1, compression=pilcomp)
        np.testing.assert_array_equal(read_tiff(p1), img)

        p2 = str(tmp_path / "ours.tiff")
        write_tiff(p2, img, compression=ours,
                   predictor=2 if ours != "packbits" else 1)
        np.testing.assert_array_equal(np.asarray(PIL.open(p2)), img)

    def test_full_loader_path_on_deflate_tree(self, tmp_path):
        """The complete DFC2023 pipeline over a deflate-compressed tree
        (rasterio's most common GeoTIFF output) matches the uncompressed
        tree bit-for-bit — including the fused native fast path if built."""
        import functools

        comp_dir, raw_dir = tmp_path / "comp", tmp_path / "raw"
        _write_tree(str(raw_dir), n=3, size=64)
        _write_tree(str(comp_dir), n=3, size=64,
                    writer=functools.partial(write_tiff, compression="deflate"))
        ds_c = dfc2023.DFC2023Dataset(str(comp_dir), size=64)
        ds_r = dfc2023.DFC2023Dataset(str(raw_dir), size=64)
        for i in range(3):
            a, b = ds_c[i], ds_r[i]
            for k in ("s1", "s2", "dem"):
                np.testing.assert_array_equal(a[k], b[k])

        it = dfc2023.dfc2023_iterator(
            str(comp_dir), ("s1", "s2", "dem"), batch_size=2, input_size=64,
            num_threads=2,
        )
        b = next(it)
        assert b["s2"].shape == (2, 64, 64, 3)
        it.close()


class TestRealTiffPipeline:
    def test_full_loader_path_on_real_tiffs(self, tmp_path):
        """DFC2023Dataset + iterator over actual TIFF bytes: exact
        normalization vs direct numpy on the raw arrays."""
        raw = _write_tree(str(tmp_path), n=4, size=64)
        ds = dfc2023.DFC2023Dataset(str(tmp_path), size=64)
        assert len(ds) == 4
        for i, (rgb, sar, dsm) in enumerate(raw):
            s = ds[i]
            assert s["s1"].shape == (1, 64, 64)
            assert s["s2"].shape == (3, 64, 64)
            assert s["dem"].shape == (1, 64, 64)
            exp_sar = np.clip(10 * np.log10(sar[None] + 1e-7), -25, 0)
            exp_sar = (np.nan_to_num(exp_sar) - dfc2023.SAR_MEAN) / dfc2023.SAR_STD
            np.testing.assert_allclose(s["s1"], exp_sar, atol=2e-5)
            exp_rgb = (rgb.transpose(2, 0, 1) - dfc2023.RGB_MEAN[:, None, None]) \
                / dfc2023.RGB_STD[:, None, None]
            np.testing.assert_allclose(s["s2"], exp_rgb, atol=2e-5)
            d = dsm[None]
            exp_dsm = (d - d.mean()) / np.sqrt(d.var() + 1e-6)
            np.testing.assert_allclose(s["dem"], exp_dsm, atol=2e-5)

    def test_iterator_batches_nhwc(self, tmp_path):
        _write_tree(str(tmp_path), n=4, size=64)
        it = dfc2023.dfc2023_iterator(
            str(tmp_path), ("s1", "s2", "dem"), batch_size=2, input_size=64,
            num_threads=2,
        )
        b = next(it)
        assert b["s1"].shape == (2, 64, 64, 1)
        assert b["s2"].shape == (2, 64, 64, 3)
        assert b["dem"].shape == (2, 64, 64, 1)
        assert all(v.dtype == np.float32 for v in b.values())

    def test_random_crop_consistent_across_modalities(self, tmp_path):
        """Shared-window RandomCrop (multimodal_dfc2023.py:54-94): the same
        window must be cut from every modality of a sample."""
        size = 64
        _write_tree(str(tmp_path), n=2, size=size)
        ds = dfc2023.DFC2023Dataset(str(tmp_path), size=size, transform=True,
                                    crop_size=32, seed=3)
        full = dfc2023.DFC2023Dataset(str(tmp_path), size=size)
        s = ds[0]
        f = full[0]
        assert s["s2"].shape == (3, 32, 32)
        # locate the crop in the full image via the s2 channel and check the
        # SAME offset reproduces s1 and dem
        found = False
        for y in range(size - 32 + 1):
            for x in range(size - 32 + 1):
                if np.allclose(f["s2"][:, y:y + 32, x:x + 32], s["s2"]):
                    np.testing.assert_allclose(
                        f["s1"][:, y:y + 32, x:x + 32], s["s1"])
                    np.testing.assert_allclose(
                        f["dem"][:, y:y + 32, x:x + 32], s["dem"])
                    found = True
                    break
            if found:
                break
        assert found, "crop window not found in the source image"
