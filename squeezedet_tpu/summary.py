"""TensorBoard-compatible summary writing.

The observability surface matches the reference (SURVEY §5.5): per-loss
scalars, learning rate, mean IoU, AP/timing scalars from eval, and image
summaries of drawn detections.  Uses tf.summary when TensorFlow is
available (it is in this image), otherwise falls back to a no-op writer
so training never depends on TF.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class SummaryWriter:
    """Thin event-file writer; scalar(), image(), flush(), close()."""

    def __init__(self, logdir: str):
        self._writer = None
        try:
            import tensorflow as tf
            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tf = None

    def scalar(self, tag: str, value: float, step: int):
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, value, step=step)

    def histogram(self, tag: str, values, step: int,
                  buckets: Optional[int] = None):
        """Value-distribution summary (reference nn_skeleton.py:353-358
        per-variable/per-gradient histograms, :736-755 activations)."""
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.histogram(tag, np.asarray(values), step=step,
                                       buckets=buckets)

    def image(self, tag: str, images: np.ndarray, step: int,
              max_outputs: int = 20):
        """images: [N, H, W, 3] RGB uint8/float."""
        if self._writer is None:
            return
        arr = np.asarray(images)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        with self._writer.as_default():
            self._tf.summary.image(tag, arr, step=step,
                                   max_outputs=max_outputs)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


def maybe_summary_writer(logdir: Optional[str]) -> Optional[SummaryWriter]:
    return SummaryWriter(logdir) if logdir else None
