"""ADE20k-style odgt semantic dataset
(reference downstream/instance_segmentation/dataset/dataset.py:34-199
``ADE200kDataset``: json-lines records {fpath_img, fpath_segm} with
training.odgt / validation.odgt lists; the reference batches dynamic sizes
per-batch — on TPU every sample is resized/cropped to one static size).

Image IO: PIL or npy side-cars (gated; no imgaug dependency — the
aug_strategy.py pipeline reduces to flip + crop here).
"""
from __future__ import annotations

import json
import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


def _load_image(path: str) -> np.ndarray:
    npy = os.path.splitext(path)[0] + ".npy"
    if os.path.exists(npy):
        arr = np.load(npy)
    else:
        from PIL import Image  # type: ignore

        arr = np.asarray(Image.open(path))
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = (np.arange(h) * img.shape[0] / h).astype(np.int64)
    xs = (np.arange(w) * img.shape[1] / w).astype(np.int64)
    return img[ys][:, xs]


IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255


class ADEOdgtDataset:
    def __init__(self, odgt_path: str, root: str = "", img_size: int = 256,
                 segm_downsampling_rate: int = 1, flip: bool = False, seed: int = 0):
        self.records: List[Dict] = []
        with open(odgt_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    self.records.append(json.loads(line))
        if not self.records:
            raise FileNotFoundError(f"no records in {odgt_path}")
        self.root = root
        self.img_size = img_size
        self.segm_rate = segm_downsampling_rate
        self.flip = flip
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        rec = self.records[i]
        img = _load_image(os.path.join(self.root, rec["fpath_img"])).astype(np.float32)
        segm = _load_image(os.path.join(self.root, rec["fpath_segm"]))[..., 0]
        s = self.img_size
        img = _resize_nearest(img, s, s)
        segm = _resize_nearest(segm.astype(np.int32), s, s)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        img = (img[..., :3] - IMG_MEAN) / IMG_STD
        if self.flip and self.rng.random() < 0.5:
            img = img[:, ::-1]
            segm = segm[:, ::-1]
        if self.segm_rate > 1:
            segm = segm[:: self.segm_rate, :: self.segm_rate]
        return {"image": np.ascontiguousarray(img),
                "label": np.ascontiguousarray(segm)}


def ade_batch_iterator(ds: ADEOdgtDataset, batch_size: int, shuffle: bool = True,
                       seed: int = 0, prefetch: int = 2
                       ) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def producer():
        idx = np.arange(len(ds))
        while True:
            if shuffle:
                rng.shuffle(idx)
            for start in range(0, len(ds) - batch_size + 1, batch_size):
                samples = [ds[int(i)] for i in idx[start : start + batch_size]]
                q.put({k: np.stack([s[k] for s in samples]) for k in samples[0]})

    threading.Thread(target=producer, daemon=True).start()
    while True:
        yield q.get()
