"""Scalar metric logging: JSONL always, TensorBoard when TF is present.

Replaces the reference's tf.summary plumbing (train_fn.py:75,95-106;
ops.add_value_summary, common/ops.py:54-59) with an append-only
``events.jsonl`` (machine-readable, dependency-free) plus an optional
TensorBoard writer for visual continuity.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "events.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: deferred, optional

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf

                for k, v in values.items():
                    tf.summary.scalar(k, float(v), step=int(step))
                self._tb.flush()

    def image(self, step: int, name: str, array_u8) -> None:
        """Log an HWC uint8 RGB image: PNG next to events.jsonl, plus a
        TensorBoard image when TF is present (reference's
        add_image_summaries, train_fn.py:75)."""
        import numpy as np

        arr = np.asarray(array_u8)
        # sanitize TB-style scoped names ('train/input'): cv2.imwrite
        # reports a bad path by returning False, not raising
        safe = name.replace("/", "_")
        path = os.path.join(self._dir, f"{safe}___{int(step)}.png")
        try:
            import cv2

            ok = cv2.imwrite(path, arr[..., ::-1])  # RGB -> BGR
            if not ok:
                raise IOError(f"cv2.imwrite failed for {path}")
        except ImportError:
            from PIL import Image

            Image.fromarray(arr).save(path)
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf

                tf.summary.image(name, arr[None], step=int(step))
                self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
