"""Multi-threaded host prefetch pipeline.

TPU-native replacement for the reference's FIFOQueue + 4 enqueue threads
(nn_skeleton.py:105-124, train.py:226-262): worker threads run
``imdb.read_batch`` + dense target building (the host-side hot loop,
SURVEY §3.1) into a bounded queue; the consumer overlaps host
preprocessing with device steps.  Thread-safety comes from the locked
sampler in :class:`~squeezedet_tpu.data.imdb.Imdb` plus the queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from squeezedet_tpu.data.targets import batch_to_dense_targets


class PrefetchLoader:
    """Background producers of (images [B,H,W,3] f32, Targets) tuples."""

    def __init__(self, imdb, *, num_threads: Optional[int] = None,
                 capacity: Optional[int] = None, shuffle: bool = True,
                 device_targets: bool = False, max_gt: int = 48,
                 uint8_images: bool = False):
        mc = imdb.mc
        self._imdb = imdb
        self._shuffle = shuffle
        self._device_targets = device_targets
        self._max_gt = max_gt
        self._uint8_images = uint8_images
        self._num_anchors = mc.anchors
        self._num_classes = mc.classes
        self._queue: queue.Queue = queue.Queue(
            maxsize=capacity if capacity is not None else
            max(2, mc.queue_capacity // max(1, mc.batch_size)))
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        n = num_threads if num_threads is not None else mc.num_thread
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, n))]

    def start(self) -> "PrefetchLoader":
        for t in self._threads:
            t.start()
        return self

    def _worker(self):
        try:
            while not self._stop.is_set():
                if self._device_targets:
                    # raw padded gt; the matcher runs inside the jitted
                    # train step (device_pipeline.assign_anchors_device)
                    item = self._imdb.read_batch_raw_targets(
                        shuffle=self._shuffle, max_gt=self._max_gt,
                        uint8_images=self._uint8_images)
                else:
                    batch = self._imdb.read_batch(shuffle=self._shuffle)
                    item = batch_to_dense_targets(
                        batch, num_anchors=self._num_anchors,
                        num_classes=self._num_classes)
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate to the consumer
            self._error = e
            self._stop.set()

    def get(self, timeout: float = 60.0):
        """Next (images, Targets); raises the producer's error if any."""
        while True:
            if self._error is not None:
                raise RuntimeError("prefetch worker failed") from self._error
            try:
                return self._queue.get(timeout=min(timeout, 1.0))
            except queue.Empty:
                timeout -= 1.0
                if timeout <= 0:
                    raise TimeoutError("prefetch queue starved for 60s "
                                       "(deadlock backstop, cf. "
                                       "train.py:263)")

    def stop(self):
        self._stop.set()
        # drain so producers blocked on put() can exit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=5.0)
