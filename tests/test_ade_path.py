"""ADE20k odgt semantic training path, end-to-end through the CLI
(VERDICT.md Missing #2: reference main_seg.py:64-92 + dataset.py:34-199).
Trains 2 steps on synthetic odgt data and exercises the ConfMatrix eval."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _write_synthetic_ade(root, n=6, size=48, classes=4):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    rng = np.random.default_rng(0)
    records = []
    for i in range(n):
        img = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
        seg = rng.integers(0, classes, size=(size, size)).astype(np.uint8)
        np.save(os.path.join(root, "images", f"img_{i}.npy"), img)
        np.save(os.path.join(root, "annotations", f"seg_{i}.npy"), seg)
        records.append({
            "fpath_img": f"images/img_{i}.png",
            "fpath_segm": f"annotations/seg_{i}.png",
            "width": size, "height": size,
        })
    odgt = os.path.join(root, "training.odgt")
    with open(odgt, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return odgt


def test_ade_dataset_loads(tmp_path):
    from incomplete_multimodal_fusion_tpu.data.ade_odgt import (
        ADEOdgtDataset, ade_batch_iterator,
    )

    odgt = _write_synthetic_ade(str(tmp_path))
    ds = ADEOdgtDataset(odgt, root=str(tmp_path), img_size=32)
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["label"].shape == (32, 32)
    it = ade_batch_iterator(ds, 2, seed=0)
    b = next(it)
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["label"].shape == (2, 32, 32)


@pytest.mark.slow
def test_ade_cli_trains_two_steps(tmp_path):
    odgt = _write_synthetic_ade(str(tmp_path), size=64)
    out_dir = str(tmp_path / "save")
    env = dict(os.environ,
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "train_downstream.py"),
         "--task", "semantic", "--odgt", odgt, "--ade_root", str(tmp_path),
         "--backbone", "resnet18", "--input_size", "64", "--batch_size", "2",
         "--epochs", "1", "--steps_per_epoch", "2", "--eval_freq", "1",
         "--num_classes", "4", "--num_queries", "8", "--num_points", "256",
         "--frozen_stages", "0", "--compute_dtype", "float32",
         "--output_dir", out_dir],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "mIoU=" in proc.stdout, proc.stdout[-2000:]
    assert "done" in proc.stdout
