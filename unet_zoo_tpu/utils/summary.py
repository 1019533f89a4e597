"""Metrics/observability writer.

Twin of the reference's TensorBoard SummaryWriter pair (train + validation,
reference train_model.py:89-91,299-331). Always writes a JSONL metrics
stream (machine-readable, survives without TF); adds TensorBoard event
files via tensorboardX when available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

try:
    from tensorboardX import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover
    _TBWriter = None


class MetricsWriter:
    def __init__(self, log_dir: str, name: str = "train", tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, f"metrics_{name}.jsonl"), "a")
        self._tb = (
            _TBWriter(os.path.join(log_dir, f"tb_{name}"))
            if (tensorboard and _TBWriter is not None)
            else None
        )

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), int(step))

    def image(self, step: int, tag: str, img) -> None:
        """img: (H, W) or (H, W, C) float array in [0, 1]."""
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(img, dtype=float)
            if arr.ndim == 2:
                arr = arr[None]  # CHW
            else:
                arr = arr.transpose(2, 0, 1)
            self._tb.add_image(tag, arr, int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
