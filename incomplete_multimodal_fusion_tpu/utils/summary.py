"""Training-summary writer (reference downstream/*/utils/summary.py:26-41
``create_summary`` TensorBoard wrapper + the rank-0 log.txt JSON-lines of
pretrain_mmae.py:412-414).

Writes JSONL always; mirrors to TensorBoard when a TB backend is importable
(gated — not part of this image).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class SummaryWriter:
    def __init__(self, log_dir: str, filename: str = "events.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._fh = open(self.path, "a", encoding="utf-8")
        self._tb = None
        try:  # optional TensorBoard mirror
            from torch.utils.tensorboard import SummaryWriter as TB  # type: ignore

            self._tb = TB(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._fh.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
        ) + "\n")
        self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: dict, step: int) -> None:
        for k, v in scalars.items():
            self.add_scalar(k, v, step)

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def create_summary(log_dir: str) -> SummaryWriter:
    return SummaryWriter(log_dir)
