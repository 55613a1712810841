"""Multi-threaded host prefetch pipeline.

TPU-native replacement for the reference's FIFOQueue + 4 enqueue threads
(nn_skeleton.py:105-124, train.py:226-262): worker threads run
``imdb.read_batch`` + dense target building (the host-side hot loop,
SURVEY §3.1) into a bounded queue; the consumer overlaps host
preprocessing with device steps.

Determinism contract: each worker first draws a :class:`BatchPlan`
(all RNG consumption for the batch, atomically under the imdb sampler
lock), does the pixel work lock-free, then enqueues in plan order via a
ticket — so the *stream of batches the consumer sees* is a
deterministic function of the seed for ANY thread count, and each
batch carries the sampler snapshot taken right after its own draws.
``consumed_state()`` returns the snapshot of the last batch handed to
the consumer: checkpointing that makes resume bit-exact (the resumed
run redraws exactly the batches after the last consumed one).  The
reference's FIFOQueue gives neither property (thread-scheduling order,
stream restart on resume, train.py:243-245).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Optional

import numpy as np

from squeezedet_tpu.data.targets import batch_to_dense_targets


class PrefetchLoader:
    """Background producers of (images [B,H,W,3] f32, Targets) tuples."""

    def __init__(self, imdb, *, num_threads: Optional[int] = None,
                 capacity: Optional[int] = None, shuffle: bool = True,
                 device_targets: bool = False, max_gt: int = 48,
                 uint8_images: bool = False,
                 device_augment: bool = False,
                 device_dataset: bool = False):
        mc = imdb.mc
        self._imdb = imdb
        self._shuffle = shuffle
        self._device_targets = device_targets
        self._max_gt = max_gt
        self._uint8_images = uint8_images
        self._device_augment = device_augment
        self._device_dataset = device_dataset
        self._num_anchors = mc.anchors
        self._num_classes = mc.classes
        self._queue: queue.Queue = queue.Queue(
            maxsize=capacity if capacity is not None else
            max(2, mc.queue_capacity // max(1, mc.batch_size)))
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._enq_cv = threading.Condition()
        self._next_enq_seq: Optional[int] = None
        self._consumed_state: Optional[Dict[str, np.ndarray]] = None
        n = num_threads if num_threads is not None else mc.num_thread
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, n))]

    def start(self) -> "PrefetchLoader":
        # Tickets start at the imdb's current draw sequence; while this
        # loader runs, its workers must be the only plan drawers (a
        # foreign draw would leave a hole in the ticket order and trip
        # the 60 s starvation backstop).
        self._next_enq_seq = self._imdb.next_draw_seq()
        for t in self._threads:
            t.start()
        return self

    def _worker(self):
        try:
            while not self._stop.is_set():
                plan = self._imdb.draw_batch_plan(shuffle=self._shuffle)
                if self._device_dataset:
                    # index + aug + GT rows only; the pixels are already
                    # resident in HBM (imdb.load_canvas_dataset)
                    item = self._imdb.read_batch_plan_rows(
                        max_gt=self._max_gt, plan=plan)
                elif self._device_augment:
                    # raw uint8 canvas + per-image aug rows; the whole
                    # pixel pipeline (drift/flip/resize/normalize) runs
                    # inside the jitted train step
                    item = self._imdb.read_batch_canvas(
                        max_gt=self._max_gt, plan=plan)
                elif self._device_targets:
                    # raw padded gt; the matcher runs inside the jitted
                    # train step (device_pipeline.assign_anchors_device)
                    item = self._imdb.read_batch_raw_targets(
                        max_gt=self._max_gt,
                        uint8_images=self._uint8_images, plan=plan)
                else:
                    batch = self._imdb.read_batch(plan=plan)
                    item = batch_to_dense_targets(
                        batch, num_anchors=self._num_anchors,
                        num_classes=self._num_classes)
                # ticketed enqueue: wait for this plan's turn so batches
                # reach the queue in draw order regardless of how thread
                # scheduling interleaved the pixel work
                with self._enq_cv:
                    while plan.seq != self._next_enq_seq:
                        if self._stop.is_set():
                            return
                        self._enq_cv.wait(0.2)
                if self._stop.is_set():
                    return
                # sole turn-holder: only this thread puts until the
                # ticket advances below
                enqueued = False
                while not self._stop.is_set():
                    try:
                        self._queue.put((item, plan.state), timeout=0.5)
                        enqueued = True
                        break
                    except queue.Full:
                        continue
                if enqueued:
                    with self._enq_cv:
                        self._next_enq_seq = plan.seq + 1
                        self._enq_cv.notify_all()
        except BaseException as e:  # propagate to the consumer
            self._error = e
            self._stop.set()
            with self._enq_cv:
                self._enq_cv.notify_all()

    def get(self, timeout: float = 60.0):
        """Next (images, Targets); raises the producer's error if any."""
        while True:
            if self._error is not None:
                raise RuntimeError("prefetch worker failed") from self._error
            try:
                item, state = self._queue.get(timeout=min(timeout, 1.0))
                self._consumed_state = state
                return item
            except queue.Empty:
                timeout -= 1.0
                if timeout <= 0:
                    raise TimeoutError("prefetch queue starved for 60s "
                                       "(deadlock backstop, cf. "
                                       "train.py:263)")

    def consumed_state(self) -> Optional[Dict[str, np.ndarray]]:
        """Sampler snapshot of the last batch returned by :meth:`get`
        (None before the first get).  Checkpoint this — not
        ``imdb.sampler_state()`` — for bit-exact resume: it reflects
        consumption, not the prefetch lead."""
        return self._consumed_state

    def stop(self):
        self._stop.set()
        with self._enq_cv:
            self._enq_cv.notify_all()
        # drain so producers blocked on put() can exit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=5.0)
