"""DFC2023-layout GeoTIFF pipeline (reference pretraining/utils/multimodal_dfc2023.py).

Layout: ``{path}/rgb/*.tiff`` with sibling ``sar/`` and ``dsm/`` dirs derived
by directory-name replacement (multimodal_dfc2023.py:211-217). Per-modality
normalization matches the reference exactly:

  * SAR  -> 10*log10(x + 1e-7), clip [-25, 0], z-score mu=-7.9447875
    sigma=2.777256 (multimodal_dfc2023.py:130-141, 36-41)
  * RGB  -> per-channel z-score with the DFC2023 stats
    (multimodal_dfc2023.py:27-33, 116-126)
  * DSM  -> nan_to_num, per-image standardize (multimodal_dfc2023.py:99-112)

IO backends (gated): rasterio if available, else tifffile, else ``.npy``
side-cars. Batches come out NHWC float32 ready for device upload; the
prefetching batcher below plays the role of the reference's DataLoader
worker pool but without a process fork per epoch.
"""
from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

RGB_MEAN = np.array([81.29692, 87.93711, 72.041306], np.float32)
RGB_STD = np.array([39.61512, 35.407978, 35.84708], np.float32)
SAR_MEAN, SAR_STD = -7.9447875, 2.777256
DEM_MEAN, DEM_STD = 5.0160093, 7.6128364  # published stats (unused: per-image std)


def _read_raster(path: str) -> np.ndarray:
    """Read a raster as [C, H, W] float32; backend-gated."""
    npy = os.path.splitext(path)[0] + ".npy"
    if os.path.exists(npy):
        arr = np.load(npy)
    else:
        try:
            import rasterio  # type: ignore

            with rasterio.open(path) as src:
                arr = src.read()
        except ImportError:
            try:
                import tifffile  # type: ignore

                arr = tifffile.imread(path)
                if arr.ndim == 3 and arr.shape[-1] <= 8:  # HWC -> CHW
                    arr = arr.transpose(2, 0, 1)
            except ImportError as e:
                raise RuntimeError(
                    f"no raster backend (rasterio/tifffile) and no {npy}"
                ) from e
    if arr.ndim == 2:
        arr = arr[None]
    return arr.astype(np.float32)


def _resize_area(img: np.ndarray, size: int) -> np.ndarray:
    """Channel-wise area resize [C, H, W] -> [C, size, size]
    (resiz_4pl, multimodal_dfc2023.py:10-16). Pure-numpy box average when the
    source is an integer multiple; nearest otherwise (cv2 not assumed)."""
    c, h, w = img.shape
    if (h, w) == (size, size):
        return img
    if h % size == 0 and w % size == 0:
        fh, fw = h // size, w // size
        return img.reshape(c, size, fh, size, fw).mean(axis=(2, 4))
    ys = (np.arange(size) * h / size).astype(np.int64)
    xs = (np.arange(size) * w / size).astype(np.int64)
    return img[:, ys][:, :, xs]


def _native():
    """Native C++ kernels (data/native.py) when built; None otherwise."""
    try:
        from . import native

        return native if native.available() else None
    except Exception:
        return None


def load_sar(path: str, size: int = 256) -> np.ndarray:
    sar = _read_raster(path)
    nat = _native()
    if nat is not None and sar.shape[1] % size == 0 and sar.shape[2] % size == 0:
        return nat.box_resize(nat.sar_normalize(sar), size) if sar.shape[1:] != (size, size) \
            else nat.sar_normalize(sar)
    sar = 10.0 * np.log10(sar + 1e-7)
    sar = np.clip(sar, -25, 0)
    sar = np.nan_to_num(sar)
    sar = _resize_area(sar, size)
    return ((sar - SAR_MEAN) / SAR_STD).astype(np.float32)


def load_rgb(path: str, size: int = 256) -> np.ndarray:
    rgb = _read_raster(path)
    nat = _native()
    if nat is not None and rgb.shape[0] == 3 and rgb.shape[1:] == (size, size):
        return nat.rgb_normalize(rgb)
    rgb = np.nan_to_num(rgb)
    rgb = _resize_area(rgb, size)
    return ((rgb - RGB_MEAN[:, None, None]) / RGB_STD[:, None, None]).astype(np.float32)


def load_dsm(path: str, size: int = 256) -> np.ndarray:
    dsm = _read_raster(path)[:1]
    nat = _native()
    if nat is not None and dsm.shape[1:] == (size, size):
        return nat.dsm_standardize(dsm)
    dsm = np.nan_to_num(dsm)
    dsm = _resize_area(dsm, size)
    return ((dsm - dsm.mean()) / np.sqrt(dsm.var() + 1e-6)).astype(np.float32)


class DFC2023Dataset:
    """Sample index over the rgb/sar/dsm tree (multimodal_dfc2023.py:180-238).

    ``transform=True`` enables the consistent multimodal RandomCrop
    (multimodal_dfc2023.py:54-94, 201-205): rasters load at ``size`` and a
    shared ``crop_size`` window is cut from every modality (+ label).
    """

    def __init__(self, path: str, size: int = 256, unlabeled: bool = True,
                 transform: bool = False, crop_size: Optional[int] = None,
                 seed: int = 0):
        assert os.path.exists(path), path
        self.size = size
        self.unlabeled = unlabeled
        self.transform = transform
        self.crop_size = crop_size or size
        # per-sample generators are derived from (seed, index) on demand:
        # __getitem__ runs on a ThreadPoolExecutor (dfc2023_iterator) and a
        # shared np.random.Generator is not thread-safe (racing bit-generator
        # state => correlated crops / undefined behavior)
        self._seed = seed
        rgb_locs = sorted(
            glob.glob(os.path.join(path, "rgb/*.tiff"))
            + glob.glob(os.path.join(path, "rgb/*.tif"))
            + glob.glob(os.path.join(path, "rgb/*.npy"))
        )
        self.samples: List[Dict[str, str]] = []
        for rgb_loc in rgb_locs:
            rec = {
                "rgb": rgb_loc,
                "sar": rgb_loc.replace("rgb", "sar"),
                "dsm": rgb_loc.replace("rgb", "dsm"),
                "id": os.path.basename(rgb_loc),
            }
            if not unlabeled:
                rec["lc"] = rgb_loc.replace("rgb", "lc")
            self.samples.append(rec)
        if not self.samples:
            raise FileNotFoundError(f"no rgb rasters under {path}/rgb/")

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        s = self.samples[i]
        out = {
            "s1": load_sar(s["sar"], self.size),
            "s2": load_rgb(s["rgb"], self.size),
            "dem": load_dsm(s["dsm"], self.size),
        }
        if not self.unlabeled:
            out["label"] = _read_raster(s["lc"])[0].astype(np.int32)
        if self.transform and self.crop_size < self.size:
            from .augment import random_crop_multimodal

            rng = np.random.default_rng((self._seed, i))
            out = random_crop_multimodal(out, (self.crop_size, self.crop_size), rng)
        return out


def _to_nhwc(batch_chw: List[Dict[str, np.ndarray]], keys: Sequence[str]):
    out = {}
    for k in keys:
        stacked = np.stack([b[k] for b in batch_chw])  # [B, C, H, W]
        out[k] = np.ascontiguousarray(stacked.transpose(0, 2, 3, 1))
    return out


def dfc2023_iterator(
    path: str,
    in_domains: Tuple[str, ...],
    batch_size: int,
    input_size: int = 256,
    seed: int = 0,
    shuffle: bool = True,
    prefetch: int = 2,
    num_threads: int = 4,
    load_size: Optional[int] = None,
    random_crop: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled NHWC batch iterator with background prefetch
    (the reference's DataLoader(num_workers) role, multimodal CPU decode
    overlapped with TPU compute). ``random_crop`` loads at ``load_size``
    (default 2x input) and cuts a shared input_size window per sample."""
    from concurrent.futures import ThreadPoolExecutor

    if random_crop:
        ds = DFC2023Dataset(path, size=load_size or 2 * input_size,
                            transform=True, crop_size=input_size, seed=seed)
    else:
        ds = DFC2023Dataset(path, size=input_size)
    rng = np.random.default_rng(seed)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    pool = ThreadPoolExecutor(max_workers=num_threads)

    def producer():
        pool_idx = np.arange(len(ds))
        while True:
            if shuffle:
                rng.shuffle(pool_idx)
            for start in range(0, len(ds) - batch_size + 1, batch_size):
                idx = pool_idx[start : start + batch_size]
                samples = list(pool.map(lambda i: ds[int(i)], idx))
                q.put(_to_nhwc(samples, in_domains))

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    while True:
        yield q.get()
