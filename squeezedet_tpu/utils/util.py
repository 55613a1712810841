"""Misc host utilities (reference src/utils/util.py:139-217 and the
drawing helper train.py:51-72)."""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from squeezedet_tpu.ops.boxes import bbox_transform


def sparse_to_dense(sp_indices, output_shape, values, default_value=0):
    """Dense array from sparse (index, value) pairs (util.py:139-158)."""
    assert len(sp_indices) == len(values), \
        'Length of sp_indices is not equal to length of values'
    array = np.ones(output_shape) * default_value
    for idx, value in zip(sp_indices, values):
        array[tuple(idx)] = value
    return array


def bgr_to_rgb(ims):
    """Convert a list of BGR images to RGB (util.py:160-165)."""
    return [im[:, :, ::-1] for im in ims]


class Timer:
    """tic/toc timer with running average (util.py:198-217)."""

    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.duration = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True):
        self.duration = time.time() - self.start_time
        self.total_time += self.duration
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.duration


def draw_box(im: np.ndarray, box_list, label_list, color=(0, 255, 0),
             cdict: Optional[dict] = None, form: str = 'center'):
    """Draw labelled boxes in place (train.py:51-72)."""
    import cv2
    assert form in ('center', 'diagonal'), \
        'bounding box format not accepted: {}.'.format(form)
    for bbox, label in zip(box_list, label_list):
        if form == 'center':
            bbox = bbox_transform(bbox)
        xmin, ymin, xmax, ymax = [int(b) for b in bbox]
        l = label.split(':')[0]
        c = cdict[l] if cdict and l in cdict else color
        cv2.rectangle(im, (xmin, ymin), (xmax, ymax), c, 1)
        cv2.putText(im, label, (xmin, ymax), cv2.FONT_HERSHEY_SIMPLEX,
                    0.3, c, 1)


def enable_compilation_cache(cache_dir: str,
                             min_compile_secs: float = 1.0) -> None:
    """Persist XLA compilations across process restarts.

    First compile of the full 1248x384 program costs 40-90 s on TPU;
    with a persistent cache a restarted trainer / eval daemon / serving
    process reloads the executable in milliseconds.  Safe to call
    before or after backend init (the cache is consulted per
    compilation).  Entry points expose it as --compilation_cache.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
