"""Input-pipeline throughput: real TIFF bytes through the full
data/dfc2023.py load+normalize+(crop)+batch path (round-3 verdict Do#5).

Synthesizes a DFC2023-layout tree of actual TIFF files (uint8 RGB, float32
SAR/DSM at 256x256 — the training raster kinds), then times the threaded
prefetching iterator end-to-end and reports patches/sec (16px patches,
3 modalities = 768 patches/sample) next to the training step's consumption
rate. Reference counterpart: multimodal_dfc2023.py:99-141 + the
DataLoader(num_workers) pool.

Host-only — never touches a JAX backend, so it is safe to run while the
TPU is busy and costs no tunnel budget.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_tree(root: str, n: int, size: int, compression: str = "none") -> None:
    import functools

    from incomplete_multimodal_fusion_tpu.data.tiff import write_tiff

    w = functools.partial(write_tiff, compression=compression)
    rng = np.random.default_rng(0)
    for sub in ("rgb", "sar", "dsm"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        w(os.path.join(root, "rgb", f"t{i:03d}.tiff"),
          rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
        w(os.path.join(root, "sar", f"t{i:03d}.tiff"),
          rng.uniform(0.0, 2.0, (size, size)).astype(np.float32))
        w(os.path.join(root, "dsm", f"t{i:03d}.tiff"),
          rng.uniform(-3.0, 40.0, (size, size)).astype(np.float32))


def bench_data_pipeline(n_files: int = 96, size: int = 256, batch: int = 60,
                        n_batches: int = 30, num_threads: int = 8,
                        patch: int = 16):
    from incomplete_multimodal_fusion_tpu.data import dfc2023

    def run_tree(compression: str, nb: int):
        root = tempfile.mkdtemp(prefix="dfc_bench_")
        try:
            _make_tree(root, n_files, size, compression=compression)
            it = dfc2023.dfc2023_iterator(
                root, ("s1", "s2", "dem"), batch_size=batch, input_size=size,
                num_threads=num_threads, prefetch=4,
            )
            next(it)  # warm: thread pool up, page cache hot
            t0 = time.perf_counter()
            for _ in range(nb):
                b = next(it)
            dt = time.perf_counter() - t0
            it.close()  # stop the producer before the tree is deleted
            samples_per_sec = nb * batch / dt
            bytes_per_sample = sum(v.nbytes for v in b.values()) / batch
            return samples_per_sec, bytes_per_sample
        finally:
            shutil.rmtree(root, ignore_errors=True)

    samples_per_sec, bytes_per_sample = run_tree("none", n_batches)
    patches_per_sample = (size // patch) ** 2 * 3  # 768 at 256/16
    # compressed-tree variant (round-4 verdict Do#5): deflate is rasterio/
    # gdal's most common GeoTIFF output; strips inflate via zlib then ride
    # the same fused normalize-into path
    deflate_sps, _ = run_tree("deflate", max(4, n_batches // 3))
    return {
        "metric": "data_pipeline_patches_per_sec",
        "value": round(samples_per_sec * patches_per_sample, 1),
        "unit": (f"patches/sec ({num_threads} threads, real TIFF decode"
                 f" + normalize + batch; {samples_per_sec:.0f} samples/s,"
                 f" {samples_per_sec * bytes_per_sample / 1e9:.2f} GB/s"
                 " NHWC f32 out)"),
        "deflate_tree_patches_per_sec": round(
            deflate_sps * patches_per_sample, 1),
        "native_cpp_path": dfc2023._native() is not None,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(bench_data_pipeline()))
