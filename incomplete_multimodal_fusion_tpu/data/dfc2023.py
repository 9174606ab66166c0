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
    """Read a raster as [C, H, W] float32; backend-gated: rasterio >
    tifffile > builtin baseline-TIFF codec (data/tiff.py) > .npy side-car.
    The builtin codec makes real-TIFF ingestion work with zero third-party
    raster dependencies (neither rasterio nor tifffile ships here)."""
    npy = os.path.splitext(path)[0] + ".npy"
    if path.endswith(".npy") or (os.path.exists(npy) and not os.path.exists(path)):
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
            except ImportError:
                if os.path.exists(path):
                    from .tiff import read_tiff

                    arr = read_tiff(path)
                    if arr.ndim == 3 and arr.shape[-1] <= 8:  # HWC -> CHW
                        arr = arr.transpose(2, 0, 1)
                elif os.path.exists(npy):
                    arr = np.load(npy)
                else:
                    raise FileNotFoundError(f"{path} (and no {npy} side-car)")
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
    # native calls run single-threaded here: per-SAMPLE parallelism comes
    # from the iterator's thread pool, and parallel_for spawns fresh
    # std::threads per call — nested threading measured as a slowdown
    sar = _read_raster(path)
    nat = _native()
    if nat is not None and sar.shape[1] % size == 0 and sar.shape[2] % size == 0:
        return nat.box_resize(nat.sar_normalize(sar, 1), size, 1) \
            if sar.shape[1:] != (size, size) else nat.sar_normalize(sar, 1)
    sar = 10.0 * np.log10(sar + 1e-7)
    sar = np.clip(sar, -25, 0)
    sar = np.nan_to_num(sar)
    sar = _resize_area(sar, size)
    return ((sar - SAR_MEAN) / SAR_STD).astype(np.float32)


def load_rgb(path: str, size: int = 256) -> np.ndarray:
    rgb = _read_raster(path)
    nat = _native()
    if nat is not None and rgb.shape[0] == 3 and rgb.shape[1:] == (size, size):
        return nat.rgb_normalize(rgb, 1)
    rgb = np.nan_to_num(rgb)
    rgb = _resize_area(rgb, size)
    return ((rgb - RGB_MEAN[:, None, None]) / RGB_STD[:, None, None]).astype(np.float32)


def load_dsm(path: str, size: int = 256) -> np.ndarray:
    dsm = _read_raster(path)[:1]
    nat = _native()
    if nat is not None and dsm.shape[1:] == (size, size):
        return nat.dsm_standardize(dsm, 1)
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

    def load_into(self, i: int, dst: Dict[str, np.ndarray]) -> bool:
        """Fused fast path: decode the raw TIFF strips and normalize in ONE
        C++ pass straight into preallocated HWC batch-buffer slots (``dst``:
        {'s1': [H,W,1], 's2': [H,W,3], 'dem': [H,W,1]} float32 views).

        This host has to feed the chip from a single core (the training step
        consumes ~1 GB/s of normalized rasters), so pass count is the whole
        game: the default path costs ~7 memory passes per modality (decode,
        astype, transpose, nan_to_num, subtract, divide, batch-transpose);
        this one costs two (read strip, write normalized). Compressed trees
        (deflate/packbits/lzw) work too: ``read_tiff`` inflates the strips
        (zlib runs at C speed) and the normalize-into pass is unchanged.
        Falls back to ``__getitem__`` (returns False) for resized/cropped/
        labeled configs, tiled TIFFs, or exotic dtypes — numerics are
        identical either way (tests/test_data_tiff.py)."""
        if self.transform or not self.unlabeled:
            return False
        from . import native
        from .tiff import read_tiff

        if not native.available():
            return False
        s = self.samples[i]
        size = self.size
        files = {"s1": "sar", "s2": "rgb", "dem": "dsm"}
        try:
            raw = {k: read_tiff(s[files[k]]) for k in dst}
        except (KeyError, ValueError, OSError):
            return False  # compressed/tiled/npy tree or unknown key: generic
        if "s2" in raw and raw["s2"].shape != (size, size, 3):
            return False  # needs resize: generic path
        if any(raw[k].shape[:2] != (size, size)
               for k in ("s1", "dem") if k in raw):
            return False
        if "s2" in raw and not native.rgb_hwc_normalize_into(raw["s2"], dst["s2"]):
            return False
        if "s1" in raw:
            native.sar_normalize_into(raw["s1"], dst["s1"])
        if "dem" in raw:
            d = raw["dem"]
            native.standardize_into(d if d.ndim == 2 else d[..., 0], dst["dem"])
        return True


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
    n_workers = min(num_threads, max(1, (os.cpu_count() or 1) - 1))
    pool = ThreadPoolExecutor(max_workers=n_workers) if n_workers > 1 else None
    stop = threading.Event()

    # output shapes discovered once (crop changes H/W; semseg has no C axis)
    s0 = ds[0]
    shapes = {k: s0[k].shape for k in in_domains}

    def producer():
        try:
            _produce()
        except Exception:
            if not stop.is_set():  # real failures surface; teardown is quiet
                raise

    def _produce():
        pool_idx = np.arange(len(ds))
        while not stop.is_set():
            if shuffle:
                rng.shuffle(pool_idx)
            for start in range(0, len(ds) - batch_size + 1, batch_size):
                idx = pool_idx[start : start + batch_size]
                # workers write straight into preallocated NHWC buffers —
                # the CHW->HWC copy runs inside the pool instead of a serial
                # stack+transpose pass on this thread (measured 0.78 ms/sample
                # serial, the pipeline's old bottleneck)
                out = {
                    k: np.empty(
                        (batch_size, sh[1], sh[2], sh[0]), np.float32
                    )
                    for k, sh in shapes.items()
                }

                def fill(job):
                    slot, i = job
                    dst = {k: out[k][slot] for k in in_domains}
                    if ds.load_into(int(i), dst):
                        return  # fused C++ decode+normalize wrote in place
                    s = ds[int(i)]
                    for k in in_domains:
                        out[k][slot] = s[k].transpose(1, 2, 0)

                if pool is None:  # single-core host: the pool is pure
                    for job in enumerate(idx):  # overhead (~0.7 ms/sample)
                        fill(job)
                else:
                    list(pool.map(fill, enumerate(idx)))
                batch = out
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        pass
                if stop.is_set():
                    return

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    try:
        while True:
            yield q.get()
    finally:
        # generator .close() / GC: stop the producer and its pool so files
        # can be deleted and threads don't outlive the consumer
        stop.set()
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
