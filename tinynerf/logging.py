"""Metrics logging: TensorBoard-compatible scalars + JSONL fallback + preview.

The reference writes ``loss/<mode>`` and ``lr/<mode>`` TensorBoard scalars and
flushes every iteration (``nerf.py:478-480``) — which forces a device sync per
step. Here scalar values are buffered as device arrays and only materialized
at flush cadence, so logging never blocks the training pipeline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np


class MetricLogger:
    """Buffered scalar logger. Uses ``torch.utils.tensorboard`` if available
    (TB-compatible event files, like the reference), always also writes JSONL."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._writer = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._writer = None
        self._buffer: List[Dict[str, Any]] = []

    def log(self, iteration: int, scalars: Dict[str, Any]) -> None:
        """Buffer scalars (device arrays welcome — not materialized yet)."""
        self._buffer.append({"iter": iteration, **scalars})

    def flush(self) -> None:
        """Materialize buffered device values and write them out."""
        for entry in self._buffer:
            it = int(entry.pop("iter"))
            record = {"iter": it, "ts": time.time()}
            for key, value in entry.items():
                value = np.asarray(value)
                if value.size == 1:
                    value = float(value)
                    if self._writer is not None:
                        self._writer.add_scalar(key, value, it)
                    record[key] = value
                else:
                    record[key] = value.tolist()
            self._jsonl.write(json.dumps(record) + "\n")
        self._buffer.clear()
        self._jsonl.flush()
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._writer is not None:
            self._writer.close()


class NullLogger:
    """Drop-in no-op MetricLogger for non-main processes of a pod run:
    artifact and metric writes are owned by process 0 only."""

    def log(self, iteration: int, scalars: Dict[str, Any]) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


class PreviewCanvas:
    """The reference's coverage-visualization canvas: an (H, W, 3) image of
    ground-truth pixels from pic 0 seen so far (``nerf.py:460,482-483``),
    saved as a JPG every ``step`` iterations. Updated at logging cadence only
    (the reference updates per-iteration on the host, stalling the GPU)."""

    def __init__(self, height: int, width: int):
        self.canvas = np.ones((height, width, 3), np.float32)

    def update(self, rows, cols, rgb, pic) -> None:
        rows = np.asarray(rows).astype(np.int64)
        cols = np.asarray(cols).astype(np.int64)
        rgb = np.asarray(rgb)
        mask = np.asarray(pic) < 0.5  # pic 0 only, like the reference
        self.canvas[rows[mask], cols[mask]] = rgb[mask]

    def save(self, path: str) -> None:
        import imageio
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        imageio.imwrite(path, (np.clip(self.canvas, 0, 1) * 255).astype(np.uint8))
