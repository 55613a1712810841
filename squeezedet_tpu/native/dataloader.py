"""ctypes binding for the native batch image loader.

The C++ library (native/dataloader/loader.cc) moves the pixel work of
the reference input pipeline — decode, mean subtraction, drift crop,
flip, bilinear resize (imdb.py:63-193) — onto a GIL-free thread pool.
Augmentation decisions stay in Python for RNG parity; outputs are
bit-identical to the cv2 path (same OpenCV underneath).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "dataloader", "libsdloader.so")
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sdl_load_image_batch.restype = ctypes.c_int
    lib.sdl_load_image_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.sdl_load_train_batch.restype = ctypes.c_int
    lib.sdl_load_train_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def build(force: bool = False) -> str:
    """Compile the library in place (idempotent)."""
    import subprocess
    if force or not os.path.exists(_LIB_PATH):
        subprocess.check_call(
            ["make", "-C", os.path.dirname(_LIB_PATH)])
    return _LIB_PATH


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_image_batch(paths: Sequence[str], out_w: int, out_h: int,
                     bgr_means: np.ndarray, num_threads: int = 4
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Eval-path batch: returns (images [N, H, W, 3] f32,
    scales [N, 2])."""
    lib = _load()
    assert lib is not None, "libsdloader.so not built (run native.build)"
    n = len(paths)
    images = np.empty((n, out_h, out_w, 3), np.float32)
    scales = np.empty((n, 2), np.float32)
    means = np.ascontiguousarray(np.asarray(bgr_means,
                                            np.float32).reshape(3))
    rc = lib.sdl_load_image_batch(
        _paths_array(paths), n, out_w, out_h, _fptr(means), num_threads,
        _fptr(images), _fptr(scales))
    if rc != 0:
        raise IOError("native loader failed with code {}".format(rc))
    return images, scales


def load_train_batch(paths: Sequence[str], out_w: int, out_h: int,
                     bgr_means: np.ndarray, drift: np.ndarray,
                     flip: np.ndarray, num_threads: int = 4
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Train-path batch with per-image (dx, dy) drift and flip flags
    decided by the caller.  Returns (images, scales)."""
    lib = _load()
    assert lib is not None, "libsdloader.so not built (run native.build)"
    n = len(paths)
    images = np.empty((n, out_h, out_w, 3), np.float32)
    scales = np.empty((n, 2), np.float32)
    means = np.ascontiguousarray(np.asarray(bgr_means,
                                            np.float32).reshape(3))
    drift = np.ascontiguousarray(np.asarray(drift, np.float32)
                                 .reshape(n, 2))
    flip_u8 = np.ascontiguousarray(np.asarray(flip, np.uint8).reshape(n))
    rc = lib.sdl_load_train_batch(
        _paths_array(paths), n, out_w, out_h, _fptr(means), _fptr(drift),
        flip_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads, _fptr(images), _fptr(scales))
    if rc != 0:
        raise IOError("native loader failed with code {}".format(rc))
    return images, scales
