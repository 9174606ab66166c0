"""Minimal zero-dependency baseline-TIFF codec for the raster pipeline.

The DFC2023 tree the reference trains on (multimodal_dfc2023.py:99-141)
is GeoTIFF rasters: uint8 RGB, float32 SAR/DSM. GeoTIFF is plain TIFF plus
georeferencing tags the training path never reads — pixel ingestion only
needs baseline TIFF 6.0. This module decodes (and encodes, for tests and
dataset preparation) uncompressed strip-based baseline TIFF with
uint8/uint16/int16/int32/float32/float64 samples, chunky or planar layout,
either byte order, so the loader works with zero third-party raster
dependencies (this environment has neither rasterio nor tifffile).

Deliberately NOT a general TIFF library: compressed (LZW/deflate/packbits)
or tiled files raise a clear error pointing at the optional backends, which
take precedence in data/dfc2023.py when installed.
"""
from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

# TIFF tag ids (TIFF 6.0 spec)
_WIDTH, _LENGTH, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_COUNTS, _PLANAR, _SAMPLE_FORMAT = 279, 284, 339

# field type -> (struct code, byte size)
_FIELD = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 8: ("h", 2), 9: ("i", 4),
          16: ("Q", 8), 17: ("q", 8)}

# (sample_format, bits) -> numpy dtype char
_DTYPES = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
           (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
           (3, 32): "f4", (3, 64): "f8"}


def _read_entries(buf: bytes, off: int, en: str) -> Dict[int, Tuple]:
    (count,) = struct.unpack_from(en + "H", buf, off)
    entries = {}
    for i in range(count):
        tag, ftype, n = struct.unpack_from(en + "HHI", buf, off + 2 + 12 * i)
        if ftype not in _FIELD:
            continue  # rationals/ascii: geo tags, irrelevant to pixels
        code, size = _FIELD[ftype]
        total = size * n
        voff = off + 2 + 12 * i + 8
        if total > 4:
            (voff,) = struct.unpack_from(en + "I", buf, voff)
        entries[tag] = struct.unpack_from(en + code * n, buf, voff)
    return entries


def read_tiff(path: str) -> np.ndarray:
    """Decode the first IFD as [H, W] (1 sample) or [H, W, S] array."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        en = "<"
    elif buf[:2] == b"MM":
        en = ">"
    else:
        raise ValueError(f"{path}: not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(en + "HI", buf, 2)
    if magic != 42:
        raise ValueError(f"{path}: not a classic TIFF (magic {magic})")
    e = _read_entries(buf, ifd_off, en)

    comp = e.get(_COMPRESSION, (1,))[0]
    if comp != 1:
        raise ValueError(
            f"{path}: compression {comp} unsupported by the builtin codec — "
            "install rasterio or tifffile, or re-encode uncompressed")
    w = e[_WIDTH][0]
    h = e[_LENGTH][0]
    spp = e.get(_SAMPLES_PER_PIXEL, (1,))[0]
    bits = e.get(_BITS, (8,) * spp)
    fmt = e.get(_SAMPLE_FORMAT, (1,) * spp)
    if len(set(bits)) != 1 or len(set(fmt)) != 1:
        raise ValueError(f"{path}: heterogeneous samples unsupported")
    key = (fmt[0], bits[0])
    if key not in _DTYPES:
        raise ValueError(f"{path}: sample format/bits {key} unsupported")
    dt = np.dtype(en + _DTYPES[key])

    offsets = e[_STRIP_OFFSETS]
    counts = e.get(_STRIP_COUNTS)
    if counts is None:  # single-strip files may omit it
        counts = (h * w * spp * dt.itemsize,)
    data = b"".join(buf[o:o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(data, dtype=dt)
    planar = e.get(_PLANAR, (1,))[0]
    if planar == 2 and spp > 1:  # planar: strips ordered plane-major
        arr = arr.reshape(spp, h, w).transpose(1, 2, 0)
    else:
        arr = arr.reshape(h, w, spp) if spp > 1 else arr.reshape(h, w)
    return np.ascontiguousarray(arr)


def write_tiff(path: str, arr: np.ndarray) -> None:
    """Encode [H, W] or [H, W, S] as single-strip little-endian TIFF."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    dt = arr.dtype
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    if (fmt, bits) not in _DTYPES:
        raise ValueError(f"cannot encode dtype {dt}")
    pix = np.ascontiguousarray(arr, dtype=dt.newbyteorder("<")).tobytes()

    tags = []  # (tag, ftype, count, values)
    def tag(t, ftype, vals):
        tags.append((t, ftype, len(vals), tuple(vals)))

    tag(_WIDTH, 4, [w])
    tag(_LENGTH, 4, [h])
    tag(_BITS, 3, [bits] * spp)
    tag(_COMPRESSION, 3, [1])
    tag(_PHOTOMETRIC, 3, [2 if spp == 3 else 1])
    tag(_STRIP_OFFSETS, 4, [0])  # patched below
    tag(_SAMPLES_PER_PIXEL, 3, [spp])
    tag(_ROWS_PER_STRIP, 4, [h])
    tag(_STRIP_COUNTS, 4, [len(pix)])
    tag(_PLANAR, 3, [1])
    tag(_SAMPLE_FORMAT, 3, [fmt] * spp)
    tags.sort()

    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_size
    extra = b""
    entries = b""
    data_off = None  # where the strip-offset value lives, patched at the end
    for t, ftype, n, vals in tags:
        code, size = _FIELD[ftype]
        total = size * n
        if total <= 4:
            vbytes = struct.pack("<" + code * n, *vals).ljust(4, b"\0")
        else:
            vbytes = struct.pack("<I", extra_off + len(extra))
            extra += struct.pack("<" + code * n, *vals)
        if t == _STRIP_OFFSETS:
            data_off = ifd_off + 2 + len(entries) + 8
        entries += struct.pack("<HHI", t, ftype, n) + vbytes
    pix_off = extra_off + len(extra)
    head = struct.pack("<2sHI", b"II", 42, ifd_off)
    ifd = struct.pack("<H", len(tags)) + entries + struct.pack("<I", 0)
    blob = bytearray(head + ifd + extra + pix)
    struct.pack_into("<I", blob, data_off, pix_off)
    with open(path, "wb") as f:
        f.write(bytes(blob))
