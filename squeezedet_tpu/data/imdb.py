"""Image-database base class: epoch-shuffled batch reading, augmentation
and anchor-target assignment.

Behavioural contract from reference ``src/dataset/imdb.py``:

* ``read_image_batch`` (imdb.py:63-97): BGR float32, mean-subtracted,
  resized to model resolution, returning per-image (x, y) scales;
* ``read_batch`` (imdb.py:99-249): random drift crop that keeps every GT
  box inside the image, 50%% horizontal flip, resize, GT scaling, and the
  greedy best-IoU "unclaimed anchor" assignment with a nearest-anchor
  fallback (imdb.py:197-235) and delta encoding
  dx=(cx-ax)/aw, dy=(cy-ay)/ah, dw=log(w/aw), dh=log(h/ah);
* ``visualize_detections`` (imdb.py:254-305): error-type gallery images.

The sampler is protected by a lock so multi-threaded prefetch is safe by
construction (the reference mutates ``_cur_idx`` from 4 threads and is
saved only by the GIL — SURVEY §5.2).
"""

from __future__ import annotations

import os
import random
import shutil
import threading
from collections import OrderedDict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from squeezedet_tpu.config import ModelConfig
from squeezedet_tpu.ops.boxes import batch_iou


@dataclass
class BatchPlan:
    """One batch's sampler decisions, drawn atomically under the lock.

    ``seq`` is the draw sequence number (monotonic per imdb); ``state``
    is the sampler snapshot taken immediately AFTER this batch's draws,
    i.e. the state a resumed run restores to continue with the NEXT
    batch.  ``augment`` holds the per-image ((dx, dy), flip) decisions
    (None when augmentation is off), so the pixel work that consumes
    the plan draws no RNG at all — any thread can execute it in any
    order without perturbing the stream.
    """

    seq: int
    batch_idx: List[str]
    augment: Optional[List[Tuple[Tuple[int, int], bool]]]
    state: Dict[str, np.ndarray]


class Imdb:
    """Image database base class."""

    def __init__(self, name: str, mc: ModelConfig,
                 rng: Optional[np.random.RandomState] = None):
        self._name = name
        self._classes: Sequence[str] = []
        self._image_set = ""
        self._image_idx: List[str] = []
        self._data_root_path = ""
        self._rois: Dict[str, list] = {}
        self.mc = mc
        self._rng = rng if rng is not None else np.random.RandomState()

        # batch reader state
        self._perm_idx: Optional[List[str]] = None
        self._cur_idx = 0
        self._draw_seq = 0
        self._lock = threading.Lock()
        self._size_cache: Dict[str, Tuple[int, int]] = {}

        # bounded decoded-image cache (mc.image_cache_mb, 0 = off)
        self._image_cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._image_cache_bytes = 0
        self._image_cache_lock = threading.Lock()

    def _imread(self, idx: str) -> np.ndarray:
        """Decode the image for ``idx`` (BGR uint8, like cv2.imread).

        When ``mc.image_cache_mb > 0`` decoded frames are kept in a
        byte-bounded LRU so re-visits skip the PNG/JPEG decode — the
        dominant per-step host cost on single-core hosts once
        augmentation runs on device (the reference re-decodes every
        epoch, imdb.py:141).  Cached arrays are returned read-only and
        shared across batches; every consumer in this module either
        copies (astype/canvas assignment) or reads through cv2, so the
        cache is never aliased by a mutation.  The C++ native loader
        has its own decode path and bypasses this cache.
        """
        import cv2
        budget = int(getattr(self.mc, "image_cache_mb", 0)) << 20
        if budget <= 0:
            return cv2.imread(self._image_path_at(idx))
        with self._image_cache_lock:
            im = self._image_cache.get(idx)
            if im is not None:
                self._image_cache.move_to_end(idx)
                return im
        im = cv2.imread(self._image_path_at(idx))
        im.setflags(write=False)
        with self._image_cache_lock:
            if idx not in self._image_cache:
                self._image_cache[idx] = im
                self._image_cache_bytes += im.nbytes
            while (self._image_cache_bytes > budget
                   and len(self._image_cache) > 1):
                _, old = self._image_cache.popitem(last=False)
                self._image_cache_bytes -= old.nbytes
        return im

    def _image_size(self, idx: str) -> Tuple[int, int]:
        """(width, height) from the image header without a full decode."""
        size = self._size_cache.get(idx)
        if size is None:
            from PIL import Image
            with Image.open(self._image_path_at(idx)) as im:
                size = im.size
            self._size_cache[idx] = size
        return size

    # -- properties mirroring the reference API (imdb.py:30-56) ------------
    @property
    def name(self):
        return self._name

    @property
    def classes(self):
        return self._classes

    @property
    def num_classes(self):
        return len(self._classes)

    @property
    def image_idx(self):
        return self._image_idx

    @property
    def image_set(self):
        return self._image_set

    @property
    def data_root_path(self):
        return self._data_root_path

    # -- sampler ------------------------------------------------------------
    def _shuffle_image_idx(self):
        perm = self._rng.permutation(np.arange(len(self._image_idx)))
        self._perm_order = perm
        self._perm_idx = [self._image_idx[i] for i in perm]
        self._cur_idx = 0

    def shard_hosts(self, process_index: int, process_count: int) -> None:
        """Restrict this imdb to one process's strided shard of the
        image list.  Multi-host data parallelism needs every controller
        to contribute a DISJOINT local batch (mesh.shard_batch_multihost
        concatenates them into the global batch); without sharding, P
        same-seeded hosts would feed P identical copies."""
        if process_count <= 1:
            return
        with self._lock:
            # Pin the canvas extents to the FULL image list before
            # shedding it: canvas_size() must agree across controllers
            # (each builds one slice of the same global array), and a
            # shard that happens to lack the tallest/widest image would
            # otherwise compute a smaller canvas than its peers.
            self.canvas_size()
            self._image_idx = self._image_idx[process_index::process_count]
            assert self._image_idx, (
                "host shard {}/{} is empty — fewer images than "
                "processes".format(process_index, process_count))
        self._shuffle_image_idx_locked()

    def _shuffle_image_idx_locked(self):
        with self._lock:
            self._shuffle_image_idx()

    # -- data-axis sharding (device-resident dataset over a mesh) -----------
    def shard_data(self, num_shards: int) -> None:
        """Switch the sampler to per-shard drawing for a canvas stack
        SHARDED over a mesh's ``data`` axis (--device_dataset on >1
        data-parallel devices): the image list is partitioned into
        ``num_shards`` strided shards (shard s = images[s::D]) and every
        batch is the concatenation, shard-major, of batch_size/D draws
        from each shard's own epoch permutation.

        Slot group s of each batch then only ever references shard s's
        images, so the device holding data-axis coordinate s gathers its
        canvas rows LOCALLY — no collective in the gather, and N devices
        hold N× the dataset instead of N replicas (the round-4 mode
        replicated the full stack into every chip's HBM).  The stream is
        a deterministic function of (seed, num_shards) alone — process
        topology does not enter — so a 2-host × k-device run and a
        single-host run over the same mesh consume bit-identical
        batches (pinned by test_multihost).

        The reference analog is the topology-agnostic input pipeline
        (train.py:254-262): any chip count feeds from the same dataset.
        """
        if num_shards <= 1:
            return
        with self._lock:
            if getattr(self, "_data_shards", None) is not None:
                if len(self._data_shards) == num_shards:
                    return  # idempotent: train() may be re-entered on
                    # the same imdb (resume flows); the live sampler
                    # state is the stream position and must be kept
                raise ValueError(
                    "imdb is already sharded {} ways; cannot re-shard "
                    "to {} (the per-shard stream is a function of the "
                    "shard count — build a fresh imdb for a different "
                    "mesh)".format(len(self._data_shards), num_shards))
            if self.mc.batch_size % num_shards:
                raise ValueError(
                    "batch_size={} not divisible by the {} data shards "
                    "of the mesh".format(self.mc.batch_size, num_shards))
            # canvas extents must be pinned over the FULL list (every
            # shard is a slice of one global stack)
            self.canvas_size()
            shards = [self._image_idx[s::num_shards]
                      for s in range(num_shards)]
            per = self.mc.batch_size // num_shards
            for s, shard in enumerate(shards):
                if per > len(shard):
                    raise ValueError(
                        "per-shard batch {} exceeds the {} images of "
                        "data shard {}/{}".format(per, len(shard), s,
                                                  num_shards))
            self._data_shards = shards
            # padded row stride of the shard-major canvas stack
            self._shard_rows = max(len(s) for s in shards)
            # positions switch to the shard-major padded layout
            if hasattr(self, "_dataset_pos"):
                del self._dataset_pos
            self._shard_perm_order = [None] * num_shards
            self._shard_perm_idx = [None] * num_shards
            self._shard_cur = [0] * num_shards
            # initial epoch permutations, drawn in shard order
            for s in range(num_shards):
                self._shuffle_shard(s)

    @property
    def num_data_shards(self) -> int:
        return len(getattr(self, "_data_shards", ()) or ()) or 1

    def _shuffle_shard(self, s: int) -> None:
        shard = self._data_shards[s]
        perm = self._rng.permutation(np.arange(len(shard)))
        self._shard_perm_order[s] = perm
        self._shard_perm_idx[s] = [shard[i] for i in perm]
        self._shard_cur[s] = 0

    def sampler_state(self) -> Dict[str, np.ndarray]:
        """Snapshot of the input-stream position as plain arrays: the
        epoch permutation, the cursor, and the augmentation RNG.  Saved
        alongside checkpoints so a resumed run continues the data stream
        where it left off instead of restarting the epoch (the reference
        restarts the stream on resume, train.py:243-245).

        The trainer checkpoints the *consumed* batch's snapshot (each
        :class:`BatchPlan` carries its own post-draw state through the
        prefetch queue), so resume is bit-exact: the resumed run redraws
        exactly the batches after the last one the train step consumed.
        Calling this method directly snapshots the producer-side state
        instead, which with a prefetch depth > 0 can run up to the queue
        capacity (plus in-flight batches) ahead of consumption."""
        with self._lock:
            return self._sampler_state_locked()

    def _sampler_state_locked(self) -> Dict[str, np.ndarray]:
        key, pos, has_gauss, cached = self._rng.get_state()[1:]
        perm = getattr(self, "_perm_order", None)
        state = {
            "perm_order": (np.asarray(perm, np.int64)
                           if perm is not None
                           else np.zeros((0,), np.int64)),
            "cur_idx": np.asarray(self._cur_idx, np.int64),
            "rng_key": np.asarray(key, np.uint32),
            "rng_pos": np.asarray(pos, np.int64),
            "rng_has_gauss": np.asarray(has_gauss, np.int64),
            "rng_cached_gaussian": np.asarray(cached, np.float64),
        }
        if getattr(self, "_data_shards", None):
            d = len(self._data_shards)
            perm2 = np.full((d, self._shard_rows), -1, np.int64)
            for s in range(d):
                p = self._shard_perm_order[s]
                perm2[s, :len(p)] = p
            state["shard_perm_order"] = perm2
            state["shard_cur"] = np.asarray(self._shard_cur, np.int64)
        return state

    def set_sampler_state(self, state: Dict[str, np.ndarray]) -> None:
        """Restore a :meth:`sampler_state` snapshot (inverse op)."""
        with self._lock:
            perm = np.asarray(state["perm_order"], np.int64)
            if perm.size:
                if perm.size != len(self._image_idx):
                    raise ValueError(
                        "sampler state is for a {}-image set, this "
                        "imdb has {}".format(perm.size,
                                             len(self._image_idx)))
                self._perm_order = perm
                self._perm_idx = [self._image_idx[i] for i in perm]
            self._cur_idx = int(state["cur_idx"])
            # ValueError (not assert): a mismatched restore silently
            # corrupts the resumed stream, so the guards must survive
            # python -O like _next_batch_idx_locked's
            has_shard_state = ("shard_perm_order" in state
                               and np.asarray(
                                   state["shard_perm_order"]).size)
            if getattr(self, "_data_shards", None) and not has_shard_state:
                # the symmetric direction: an UNSHARDED snapshot (from a
                # single-data-shard run or a pre-shard_data checkpoint)
                # restored into a sharded imdb would keep the fresh-seed
                # shard permutations but jump the RNG to the checkpoint —
                # a hybrid stream that is neither a fresh start nor a
                # continuation
                raise ValueError(
                    "this imdb is data-sharded {} ways but the sampler "
                    "state is unsharded — resume the run on a mesh with "
                    "the same data-axis size it was checkpointed "
                    "with".format(len(self._data_shards)))
            if has_shard_state:
                if not getattr(self, "_data_shards", None):
                    raise ValueError(
                        "sampler state is data-sharded; call "
                        "shard_data() before restoring it")
                perm2 = np.asarray(state["shard_perm_order"], np.int64)
                if perm2.shape[0] != len(self._data_shards):
                    raise ValueError(
                        "sampler state has {} data shards, this imdb "
                        "has {} — resume a sharded --device_dataset "
                        "run on a mesh with the same data-axis size "
                        "it was checkpointed with".format(
                            perm2.shape[0], len(self._data_shards)))
                for s in range(perm2.shape[0]):
                    p = perm2[s][perm2[s] >= 0]
                    if p.size != len(self._data_shards[s]):
                        raise ValueError(
                            "sampler-state shard {} has {} rows, this "
                            "imdb's shard has {}".format(
                                s, p.size, len(self._data_shards[s])))
                    self._shard_perm_order[s] = p
                    self._shard_perm_idx[s] = [
                        self._data_shards[s][i] for i in p]
                cur = [int(c) for c in np.asarray(state["shard_cur"])]
                for s, c in enumerate(cur):
                    if not 0 <= c <= len(self._data_shards[s]):
                        raise ValueError(
                            "sampler-state shard {} cursor {} is out of "
                            "range for its {}-image shard".format(
                                s, c, len(self._data_shards[s])))
                self._shard_cur = cur
            self._rng.set_state(
                ("MT19937", np.asarray(state["rng_key"], np.uint32),
                 int(state["rng_pos"]), int(state["rng_has_gauss"]),
                 float(state["rng_cached_gaussian"])))

    def reset_cursor(self) -> None:
        """Rewind the sequential read cursor to the start of the image
        list (used by eval's full-split scans).  Takes the sampler lock;
        external callers must never poke ``_cur_idx`` directly."""
        with self._lock:
            self._cur_idx = 0

    def _next_batch_idx(self, shuffle: bool) -> List[str]:
        """Thread-safe version of the index window logic (imdb.py:115-127)."""
        with self._lock:
            return self._next_batch_idx_locked(shuffle)

    def _next_batch_idx_locked(self, shuffle: bool) -> List[str]:
        mc = self.mc
        if shuffle and getattr(self, "_data_shards", None):
            # per-shard windows, concatenated shard-major (shard_data)
            per = mc.batch_size // len(self._data_shards)
            batch_idx: List[str] = []
            for s in range(len(self._data_shards)):
                if self._shard_cur[s] + per >= len(self._data_shards[s]):
                    self._shuffle_shard(s)
                batch_idx.extend(self._shard_perm_idx[s][
                    self._shard_cur[s]:self._shard_cur[s] + per])
                self._shard_cur[s] += per
            return batch_idx
        if shuffle:
            # the epoch window below takes a straight slice of the
            # permutation (reference imdb.py:115-121), so a batch can
            # never exceed the (possibly host-sharded) image list —
            # fail loudly instead of feeding short batches that would
            # retrace every jitted program
            if mc.batch_size > len(self._image_idx):
                # ValueError, not assert: must survive python -O
                raise ValueError(
                    "batch_size={} exceeds the {} images in this imdb "
                    "shard; shrink the batch or grow the dataset".format(
                        mc.batch_size, len(self._image_idx)))
            if self._cur_idx + mc.batch_size >= len(self._image_idx):
                self._shuffle_image_idx()
            batch_idx = self._perm_idx[
                self._cur_idx:self._cur_idx + mc.batch_size]
            self._cur_idx += mc.batch_size
        else:
            if self._cur_idx + mc.batch_size >= len(self._image_idx):
                batch_idx = (
                    self._image_idx[self._cur_idx:]
                    + self._image_idx[:self._cur_idx + mc.batch_size
                                      - len(self._image_idx)])
                self._cur_idx += mc.batch_size - len(self._image_idx)
            else:
                batch_idx = self._image_idx[
                    self._cur_idx:self._cur_idx + mc.batch_size]
                self._cur_idx += mc.batch_size
        return batch_idx

    def next_draw_seq(self) -> int:
        """The sequence number the next :meth:`draw_batch_plan` will get
        (loaders capture this at start to ticket their enqueue order)."""
        with self._lock:
            return self._draw_seq

    def _gt_boxes_for(self, idx: str) -> np.ndarray:
        return np.array(
            [[b[0], b[1], b[2], b[3]] for b in self._rois[idx][:]])

    def draw_batch_plan(self, shuffle: bool = True) -> BatchPlan:
        """Draw one batch's sampler decisions ATOMICALLY: the index
        window (including any epoch reshuffle), every image's
        augmentation values in reference order (dy, dx, flip per image,
        imdb.py:161-180), a monotonic sequence number, and the post-draw
        sampler snapshot.

        Because all RNG consumption happens inside one critical section,
        the input stream's *content* is a deterministic function of the
        seed regardless of how many prefetch threads execute the plans —
        and carrying ``plan.state`` with the produced batch gives the
        trainer an exact consumption-time resume point.
        """
        mc = self.mc
        with self._lock:
            batch_idx = self._next_batch_idx_locked(shuffle)
            augment = None
            if mc.data_augmentation:
                augment = [
                    self._draw_augment_locked(self._gt_boxes_for(idx))
                    for idx in batch_idx]
            seq = self._draw_seq
            self._draw_seq += 1
            state = self._sampler_state_locked()
        return BatchPlan(seq=seq, batch_idx=batch_idx, augment=augment,
                         state=state)

    def _image_path_at(self, idx: str) -> str:
        raise NotImplementedError

    # -- augmentation ---------------------------------------------------------
    def _draw_augment_locked(self, gt_bbox: np.ndarray
                             ) -> Tuple[Tuple[int, int], bool]:
        """RNG half of the augmentation: draw (dy, dx, flip) in the
        reference's call order (imdb.py:161-180) — caller holds the
        sampler lock.  The reference draws unlocked from 4 threads
        (benign only under the GIL, SURVEY §5.2); here every draw is
        part of the batch's atomic plan."""
        mc = self.mc
        dx = dy = 0
        if mc.drift_x > 0 or mc.drift_y > 0:
            # largest drift that keeps every GT box inside the image
            # (imdb.py:155-162)
            max_drift_x = min(gt_bbox[:, 0] - gt_bbox[:, 2] / 2.0 + 1)
            max_drift_y = min(gt_bbox[:, 1] - gt_bbox[:, 3] / 2.0 + 1)
            assert max_drift_x >= 0 and max_drift_y >= 0, \
                'bbox out of image'
            dy = self._rng.randint(-mc.drift_y,
                                   min(mc.drift_y + 1, max_drift_y))
            dx = self._rng.randint(-mc.drift_x,
                                   min(mc.drift_x + 1, max_drift_x))
        flip = bool(self._rng.randint(2) > 0.5)
        return (dx, dy), flip

    def _augment(self, gt_bbox: np.ndarray, orig_w: float, orig_h: float,
                 im: Optional[np.ndarray] = None,
                 plan_aug: Optional[Tuple[Tuple[int, int], bool]] = None):
        """Drift crop + 50% horizontal flip, shared by every reader.

        With ``plan_aug`` the (dx, dy, flip) decisions come pre-drawn
        from a :class:`BatchPlan` and no RNG is consumed here; without
        it the values are drawn under the lock (reference call order:
        dy, dx, then flip — a parity test pins this).  Shifts the GT
        boxes and (when ``im`` is given) applies the zero-padded crop
        and flip to the pixels; the native loader passes ``im=None``
        and replays (dx, dy, flip) in its C++ thread pool.

        Returns (im, gt_bbox, orig_w, orig_h, (dx, dy), flip).
        """
        mc = self.mc
        if plan_aug is not None:
            (dx, dy), flip = plan_aug
        else:
            with self._lock:
                (dx, dy), flip = self._draw_augment_locked(gt_bbox)
        drift = mc.drift_x > 0 or mc.drift_y > 0
        if drift:
            gt_bbox[:, 0] -= dx
            gt_bbox[:, 1] -= dy
            orig_h -= dy
            orig_w -= dx
            if im is not None:
                orig_x, dist_x = max(dx, 0), max(-dx, 0)
                orig_y, dist_y = max(dy, 0), max(-dy, 0)
                # the reference zero-pads the crop AFTER mean
                # subtraction (imdb.py:164-177); the uint8 ingest path
                # crops raw pixels, so its pad value is the rounded
                # means — identical post-normalization to within bf16
                # resolution
                if im.dtype == np.uint8:
                    shifted = np.full(
                        (int(orig_h), int(orig_w), 3),
                        np.round(self.mc.bgr_means_array()),
                        np.uint8)
                else:
                    shifted = np.zeros((int(orig_h), int(orig_w), 3),
                                       np.float32)
                shifted[dist_y:, dist_x:, :] = im[orig_y:, orig_x:, :]
                im = shifted

        if flip:
            if im is not None:
                im = im[:, ::-1, :]
            gt_bbox[:, 0] = orig_w - 1 - gt_bbox[:, 0]
        return im, gt_bbox, orig_w, orig_h, (dx, dy), flip

    def _warn_truncated_gt(self, idx: str, total: int, max_gt: int):
        """The raw-targets paths pad GT to a fixed max_gt; dropping
        annotations silently would corrupt training on denser datasets,
        so count and report it (cf. the dense path's num_discarded)."""
        print('WARNING: {}: {} of {} GT boxes dropped by max_gt={}; '
              'raise max_gt to cover the dataset'.format(
                  idx, total - max_gt, total, max_gt))

    # -- reading ------------------------------------------------------------
    def read_image_batch(self, shuffle: bool = True):
        """Images only (eval path, imdb.py:63-97).

        Returns (images, scales): list of [H, W, 3] arrays and per-image
        (x_scale, y_scale).
        """
        import cv2
        mc = self.mc
        batch_idx = self._next_batch_idx(shuffle)

        if getattr(mc, "use_native_loader", False):
            from squeezedet_tpu.native import dataloader as ndl
            if ndl.available():
                paths = [self._image_path_at(i) for i in batch_idx]
                arr, sc = ndl.load_image_batch(
                    paths, mc.image_width, mc.image_height, mc.bgr_means,
                    mc.num_thread)
                return list(arr), [tuple(map(float, s)) for s in sc]

        images, scales = [], []
        for i in batch_idx:
            im = self._imread(i).astype(np.float32)
            im -= mc.bgr_means_array()
            orig_h, orig_w, _ = [float(v) for v in im.shape]
            im = cv2.resize(im, (mc.image_width, mc.image_height))
            images.append(im)
            scales.append((mc.image_width / orig_w, mc.image_height / orig_h))
        return images, scales

    def read_image_rows(self, shuffle: bool = False):
        """:meth:`read_image_batch` minus the pixels, for device-resident
        eval (--device_dataset on the eval daemon): the split's canvases
        live in HBM (load_canvas_dataset) and each poll ships only row
        positions + extents, removing the reference's per-poll im_read +
        transfer of every image (eval.py:66-97).

        Returns (pos [B] i32 rows into the canvas stack, aug [B, 5] f32
        rows (0, 0, 0, orig_w, orig_h) for the on-device resize+normalize
        program, scales list of per-image (x_scale, y_scale)).
        """
        mc = self.mc
        batch_idx = self._next_batch_idx(shuffle)
        b = len(batch_idx)
        pos = np.zeros((b,), np.int32)
        aug = np.zeros((b, 5), np.float32)
        scales = []
        for bi, idx in enumerate(batch_idx):
            pos[bi] = self.dataset_position(idx)
            w, h = self._image_size(idx)
            aug[bi] = (0.0, 0.0, 0.0, float(w), float(h))
            scales.append((mc.image_width / w, mc.image_height / h))
        return pos, aug, scales

    def eval_shard_batches(self, batch_size: int):
        """Shard-major sequential batch plan for device-resident eval
        over a D-device data mesh — the val-split twin of the sharded
        train gather: with the split partitioned into
        :meth:`shard_data`'s strided shards, batch t's slot group s
        covers shard s's rows [t*per, (t+1)*per), so slot group s only
        ever references shard s's block of the canvas stack and the
        device gather stays local (no collective; D chips hold D× the
        split instead of D replicas).

        Yields (pos [B] int32 padded global stack rows, aug [B, 5] f32
        zero-drift rows for the on-device resize+normalize, scales list
        of per-slot (x_scale, y_scale), image_indices [B] int64 index
        into ``image_idx`` with -1 marking PAD slots).  Pad slots (the
        tail of shards shorter than the padded stride, or the final
        partial window) re-reference the shard's row 0; callers must
        drop their results via ``image_indices < 0``.  Every real image
        appears exactly once across the yielded batches.
        """
        assert getattr(self, "_data_shards", None), \
            "eval_shard_batches requires shard_data()"
        mc = self.mc
        d = len(self._data_shards)
        per = batch_size // d
        assert per * d == batch_size, (batch_size, d)
        index_of = {idx: i for i, idx in enumerate(self._image_idx)}
        rows = self._shard_rows
        for t in range(-(-rows // per)):
            pos = np.zeros((batch_size,), np.int32)
            aug = np.zeros((batch_size, 5), np.float32)
            img_is = np.full((batch_size,), -1, np.int64)
            scales = []
            for s, shard in enumerate(self._data_shards):
                for k in range(per):
                    b = s * per + k
                    r = t * per + k
                    valid = r < len(shard)
                    idx = shard[r if valid else 0]
                    pos[b] = s * rows + (r if valid else 0)
                    w, h = self._image_size(idx)
                    aug[b] = (0.0, 0.0, 0.0, float(w), float(h))
                    scales.append((mc.image_width / w,
                                   mc.image_height / h))
                    if valid:
                        img_is[b] = index_of[idx]
            yield pos, aug, scales, img_is

    def read_batch(self, shuffle: bool = True,
                   plan: Optional[BatchPlan] = None):
        """Images + training annotations (imdb.py:99-249).

        Returns (image_per_batch, label_per_batch, delta_per_batch,
        aidx_per_batch, bbox_per_batch) exactly like the reference.
        ``plan`` supplies pre-drawn sampler decisions (prefetch path);
        without it one is drawn here — same RNG stream either way.
        """
        import cv2
        mc = self.mc
        if mc.data_augmentation:
            assert mc.drift_x >= 0 and mc.drift_y > 0, \
                'mc.DRIFT_X and mc.DRIFT_Y must be >= 0'
        if plan is None:
            plan = self.draw_batch_plan(shuffle)
        batch_idx = plan.batch_idx

        image_per_batch, label_per_batch = [], []
        bbox_per_batch, delta_per_batch, aidx_per_batch = [], [], []
        debug_stats = AssignStats() if mc.debug_mode else None

        for bi, idx in enumerate(batch_idx):
            im = self._imread(idx).astype(np.float32)
            im -= mc.bgr_means_array()
            orig_h, orig_w, _ = [float(v) for v in im.shape]

            label_per_batch.append([b[4] for b in self._rois[idx][:]])
            gt_bbox = self._gt_boxes_for(idx)

            if mc.data_augmentation:
                im, gt_bbox, orig_w, orig_h, _, _ = self._augment(
                    gt_bbox, orig_w, orig_h, im,
                    plan_aug=plan.augment[bi])

            im = cv2.resize(im, (mc.image_width, mc.image_height))
            image_per_batch.append(im)

            x_scale = mc.image_width / orig_w
            y_scale = mc.image_height / orig_h
            gt_bbox[:, 0::2] *= x_scale
            gt_bbox[:, 1::2] *= y_scale
            bbox_per_batch.append(gt_bbox)

            aidx_per_image, delta_per_image = assign_anchors(
                gt_bbox, np.asarray(mc.anchor_box), stats=debug_stats)
            delta_per_batch.append(delta_per_image)
            aidx_per_batch.append(aidx_per_image)

        if debug_stats is not None:
            debug_stats.dump()
        return (image_per_batch, label_per_batch, delta_per_batch,
                aidx_per_batch, bbox_per_batch)

    def read_batch_raw_targets(self, shuffle: bool = True,
                               max_gt: int = 48,
                               uint8_images: bool = False,
                               plan: Optional[BatchPlan] = None):
        """Like :meth:`read_batch` but defers anchor assignment.

        Host does exactly the reference image path (imread, mean
        subtraction, drift/flip augmentation, resize, GT scaling) and
        returns padded GT tensors for the on-device matcher
        (squeezedet_tpu.data.device_pipeline.assign_anchors_device):

        Returns (images [B, H, W, 3] f32, gt_boxes [B, max_gt, 4] f32,
        gt_labels [B, max_gt] i32, num_gt [B] i32).

        With ``uint8_images`` the pixels stay uint8 end-to-end on the
        host (crop pads with rounded means, resize rounds) and the mean
        subtraction moves into the device program — 4x less host→device
        traffic and no f32→bf16 convert + relayout on device.
        Equivalent to the f32 path to within bf16-compute resolution
        (±0.5 raw-pixel units); not supported with the native loader
        (which bakes the mean subtraction into its C++ pipeline).
        """
        import cv2
        mc = self.mc
        if plan is None:
            plan = self.draw_batch_plan(shuffle)
        batch_idx = plan.batch_idx

        b = len(batch_idx)
        gt_out = np.zeros((b, max_gt, 4), np.float32)
        labels_out = np.zeros((b, max_gt), np.int32)
        num_gt = np.zeros((b,), np.int32)

        if getattr(mc, "use_native_loader", False) and not uint8_images:
            from squeezedet_tpu.native import dataloader as ndl
            if ndl.available():
                return self._read_raw_targets_native(
                    ndl, plan, max_gt, gt_out, labels_out, num_gt)

        images = np.zeros((b, mc.image_height, mc.image_width, 3),
                          np.uint8 if uint8_images else np.float32)
        for bi, idx in enumerate(batch_idx):
            im = self._imread(idx)
            if not uint8_images:
                im = im.astype(np.float32)
                im -= mc.bgr_means_array()
            orig_h, orig_w, _ = [float(v) for v in im.shape]
            labels = [box[4] for box in self._rois[idx][:]]
            gt_bbox = self._gt_boxes_for(idx)

            if mc.data_augmentation:
                im, gt_bbox, orig_w, orig_h, _, _ = self._augment(
                    gt_bbox, orig_w, orig_h, im,
                    plan_aug=plan.augment[bi])

            images[bi] = cv2.resize(im, (mc.image_width, mc.image_height))
            gt_bbox[:, 0::2] *= mc.image_width / orig_w
            gt_bbox[:, 1::2] *= mc.image_height / orig_h

            if len(gt_bbox) > max_gt:
                self._warn_truncated_gt(idx, len(gt_bbox), max_gt)
            n = min(len(gt_bbox), max_gt)
            gt_out[bi, :n] = gt_bbox[:n]
            labels_out[bi, :n] = np.asarray(labels[:n], np.int32)
            num_gt[bi] = n

        return images, gt_out, labels_out, num_gt

    def canvas_size(self) -> Tuple[int, int]:
        """(H0, W0) = max image extents over the dataset, from header
        reads (cached).  The on-device augmentation path ships every
        image in a fixed [H0, W0] canvas so the jitted program keeps
        static shapes across KITTI's slightly-varying native sizes."""
        if not hasattr(self, "_canvas_hw"):
            h0 = w0 = 0
            for idx in self._image_idx:
                w, h = self._image_size(idx)
                h0, w0 = max(h0, h), max(w0, w)
            self._canvas_hw = (h0, w0)
        return self._canvas_hw

    def read_batch_canvas(self, shuffle: bool = True, max_gt: int = 48,
                          plan: Optional[BatchPlan] = None):
        """Raw-canvas batch for fully on-device augmentation.

        The host does ONLY decode + GT box math (the reference's cv2
        crop/flip/resize hot loop, imdb.py:141-193, runs inside the
        jitted train step — device_pipeline.augment_resize_normalize);
        augmentation decisions come pre-drawn from the BatchPlan so the
        input stream is the same deterministic function of the seed as
        the host-pixel paths.

        Returns (canvas [B, H0, W0, 3] uint8, aug [B, 5] f32 rows
        (dx, dy, flip, ow', oh'), gt_boxes [B, max_gt, 4] f32 at MODEL
        resolution, gt_labels [B, max_gt] i32, num_gt [B] i32).
        """
        import cv2
        mc = self.mc
        if plan is None:
            plan = self.draw_batch_plan(shuffle)
        batch_idx = plan.batch_idx

        b = len(batch_idx)
        h0, w0 = self.canvas_size()
        canvas = np.zeros((b, h0, w0, 3), np.uint8)
        aug = np.zeros((b, 5), np.float32)
        gt_out = np.zeros((b, max_gt, 4), np.float32)
        labels_out = np.zeros((b, max_gt), np.int32)
        num_gt = np.zeros((b,), np.int32)
        for bi, idx in enumerate(batch_idx):
            im = self._imread(idx)
            canvas[bi, :im.shape[0], :im.shape[1]] = im
            orig_h, orig_w = float(im.shape[0]), float(im.shape[1])
            labels = [box[4] for box in self._rois[idx][:]]
            gt_bbox = self._gt_boxes_for(idx)

            dxdy, flip = (0, 0), False
            if mc.data_augmentation:
                _, gt_bbox, orig_w, orig_h, dxdy, flip = self._augment(
                    gt_bbox, orig_w, orig_h, im=None,
                    plan_aug=plan.augment[bi])
            # orig_w/orig_h are now the POST-drift extents (ow', oh');
            # the real image extents are recovered as ow' + dx, oh' + dy
            aug[bi] = (dxdy[0], dxdy[1], float(flip), orig_w, orig_h)

            gt_bbox[:, 0::2] *= mc.image_width / orig_w
            gt_bbox[:, 1::2] *= mc.image_height / orig_h
            if len(gt_bbox) > max_gt:
                self._warn_truncated_gt(idx, len(gt_bbox), max_gt)
            n = min(len(gt_bbox), max_gt)
            gt_out[bi, :n] = gt_bbox[:n]
            labels_out[bi, :n] = np.asarray(labels[:n], np.int32)
            num_gt[bi] = n
        return canvas, aug, gt_out, labels_out, num_gt

    def load_canvas_dataset(self) -> np.ndarray:
        """Decode EVERY image of this split once into one uint8 canvas
        stack [N, H0, W0, 3] (top-left anchored, like
        :meth:`read_batch_canvas` rows).

        Backs the device-resident dataset mode (--device_dataset): the
        stack is uploaded to HBM once and each train step gathers its
        batch by index inside the jitted program, so the per-step
        host->device traffic collapses from B full images to B index +
        aug + GT rows (KBs).  The reference re-reads and re-transfers
        every image every epoch (imdb.py:141, feed_dict); detection
        train sets are small enough that the whole split fits in a TPU's
        HBM next to a <30 MB model (KITTI train: 3741 x 1242x375x3 =
        5.2 GB vs 16 GB on v5e).
        """
        h0, w0 = self.canvas_size()
        if getattr(self, "_data_shards", None):
            return self.load_canvas_shards(
                range(len(self._data_shards)))
        n = len(self._image_idx)
        out = np.zeros((n, h0, w0, 3), np.uint8)
        for i, idx in enumerate(self._image_idx):
            im = self._imread(idx)
            out[i, :im.shape[0], :im.shape[1]] = im
            # Record the DECODED extents as the authoritative size: the
            # plan-row reader (read_batch_plan_rows) scales GT by
            # _image_size, and a header that disagrees with the decode
            # (e.g. an EXIF-rotated JPEG) would silently diverge the GT
            # rows from the pixels resident in this stack.
            self._size_cache[idx] = (im.shape[1], im.shape[0])
        return out

    def load_canvas_shards(self, shard_ids) -> np.ndarray:
        """Canvas stack block for the given data shards (shard_data),
        shard-major and PADDED so every shard occupies exactly
        ``_shard_rows`` rows — the fixed per-device row count the
        mesh-sharded gather relies on.  Multihost controllers call this
        with just their own devices' shard ids, so each host decodes
        and uploads only 1/P of the split."""
        assert getattr(self, "_data_shards", None), \
            "load_canvas_shards requires shard_data()"
        h0, w0 = self.canvas_size()
        shard_ids = list(shard_ids)
        out = np.zeros((len(shard_ids) * self._shard_rows, h0, w0, 3),
                       np.uint8)
        for block, s in enumerate(shard_ids):
            for i, idx in enumerate(self._data_shards[s]):
                im = self._imread(idx)
                out[block * self._shard_rows + i,
                    :im.shape[0], :im.shape[1]] = im
                self._size_cache[idx] = (im.shape[1], im.shape[0])
        return out

    def dataset_position(self, idx: str) -> int:
        """Row of ``idx`` in :meth:`load_canvas_dataset`'s stack (under
        shard_data: the padded shard-major position
        ``shard * _shard_rows + row_within_shard``)."""
        if not hasattr(self, "_dataset_pos"):
            if getattr(self, "_data_shards", None):
                self._dataset_pos = {
                    image_id: s * self._shard_rows + i
                    for s, shard in enumerate(self._data_shards)
                    for i, image_id in enumerate(shard)}
            else:
                self._dataset_pos = {
                    image_id: i
                    for i, image_id in enumerate(self._image_idx)}
        return self._dataset_pos[idx]

    def read_batch_plan_rows(self, shuffle: bool = True, max_gt: int = 48,
                             plan: Optional[BatchPlan] = None):
        """:meth:`read_batch_canvas` minus the pixels.

        For the device-resident dataset mode: the canvas batch is
        gathered on DEVICE from the preloaded stack, so the host ships
        only (pos [B] i32 rows into the stack, aug [B, 5] f32, gt_boxes
        [B, max_gt, 4] f32 at model resolution, gt_labels [B, max_gt]
        i32, num_gt [B] i32).  Identical RNG consumption and GT box
        math to the canvas reader — the stream stays the same
        deterministic function of the seed, pinned by
        tests/test_device_pipeline.py.
        """
        mc = self.mc
        if plan is None:
            plan = self.draw_batch_plan(shuffle)
        batch_idx = plan.batch_idx

        b = len(batch_idx)
        pos = np.zeros((b,), np.int32)
        aug = np.zeros((b, 5), np.float32)
        gt_out = np.zeros((b, max_gt, 4), np.float32)
        labels_out = np.zeros((b, max_gt), np.int32)
        num_gt = np.zeros((b,), np.int32)
        for bi, idx in enumerate(batch_idx):
            pos[bi] = self.dataset_position(idx)
            orig_w, orig_h = [float(v) for v in self._image_size(idx)]
            labels = [box[4] for box in self._rois[idx][:]]
            gt_bbox = self._gt_boxes_for(idx)

            dxdy, flip = (0, 0), False
            if mc.data_augmentation:
                _, gt_bbox, orig_w, orig_h, dxdy, flip = self._augment(
                    gt_bbox, orig_w, orig_h, im=None,
                    plan_aug=plan.augment[bi])
            aug[bi] = (dxdy[0], dxdy[1], float(flip), orig_w, orig_h)

            gt_bbox[:, 0::2] *= mc.image_width / orig_w
            gt_bbox[:, 1::2] *= mc.image_height / orig_h
            if len(gt_bbox) > max_gt:
                self._warn_truncated_gt(idx, len(gt_bbox), max_gt)
            n = min(len(gt_bbox), max_gt)
            gt_out[bi, :n] = gt_bbox[:n]
            labels_out[bi, :n] = np.asarray(labels[:n], np.int32)
            num_gt[bi] = n
        return pos, aug, gt_out, labels_out, num_gt

    def _read_raw_targets_native(self, ndl, plan, max_gt, gt_out,
                                 labels_out, num_gt):
        """Native-loader variant of read_batch_raw_targets: augmentation
        decisions + GT box math in Python (pre-drawn in the plan, same
        RNG call order as the reference: dy, dx, then flip —
        imdb.py:161-180), pixel work in the C++ thread pool."""
        mc = self.mc
        paths, drifts, flips = [], [], []
        for bi, idx in enumerate(plan.batch_idx):
            paths.append(self._image_path_at(idx))
            orig_w, orig_h = (float(v) for v in self._image_size(idx))
            labels = [box[4] for box in self._rois[idx][:]]
            gt_bbox = self._gt_boxes_for(idx)

            dxdy = (0, 0)
            flip = False
            if mc.data_augmentation:
                _, gt_bbox, orig_w, orig_h, dxdy, flip = self._augment(
                    gt_bbox, orig_w, orig_h, im=None,
                    plan_aug=plan.augment[bi])

            drifts.append(dxdy)
            flips.append(flip)
            gt_bbox[:, 0::2] *= mc.image_width / orig_w
            gt_bbox[:, 1::2] *= mc.image_height / orig_h
            if len(gt_bbox) > max_gt:
                self._warn_truncated_gt(idx, len(gt_bbox), max_gt)
            n = min(len(gt_bbox), max_gt)
            gt_out[bi, :n] = gt_bbox[:n]
            labels_out[bi, :n] = np.asarray(labels[:n], np.int32)
            num_gt[bi] = n

        images, _ = ndl.load_train_batch(
            paths, mc.image_width, mc.image_height, mc.bgr_means,
            np.asarray(drifts, np.float32),
            np.asarray(flips, np.uint8), mc.num_thread)
        return images, gt_out, labels_out, num_gt

    def evaluate_detections(self, eval_dir, global_step, all_boxes):
        raise NotImplementedError

    # -- error-type gallery (imdb.py:254-305) --------------------------------
    def visualize_detections(self, image_dir, image_format, det_error_file,
                             output_image_dir, num_det_per_type=10):
        from PIL import Image, ImageDraw

        with open(det_error_file) as f:
            lines = f.readlines()
        random.shuffle(lines)

        dets_per_type: Dict[str, list] = {}
        for line in lines:
            obj = line.strip().split(' ')
            dets_per_type.setdefault(obj[1], []).append({
                'im_idx': obj[0],
                'bbox': [float(obj[2]), float(obj[3]),
                         float(obj[4]), float(obj[5])],
                'class': obj[6],
                'score': float(obj[7]),
            })

        out_ims = []
        color = (200, 200, 0)
        for error_type, dets in dets_per_type.items():
            det_im_dir = os.path.join(output_image_dir, error_type)
            if os.path.exists(det_im_dir):
                shutil.rmtree(det_im_dir)
            os.makedirs(det_im_dir)
            for i in range(min(num_det_per_type, len(dets))):
                det = dets[i]
                im = Image.open(
                    os.path.join(image_dir, det['im_idx'] + image_format))
                draw = ImageDraw.Draw(im)
                draw.rectangle(det['bbox'], outline=color)
                draw.text((det['bbox'][0], det['bbox'][1]),
                          '{:s} ({:.2f})'.format(det['class'], det['score']),
                          fill=color)
                im.save(os.path.join(det_im_dir, str(i) + image_format))
                out_ims.append(np.array(im)[:, :, ::-1])  # RGB -> BGR
        return out_ims


class AssignStats:
    """Anchor-assignment IoU statistics for DEBUG_MODE
    (imdb.py:134-139, 203-215, 241-246)."""

    def __init__(self):
        self.avg_ious = 0.0
        self.num_objects = 0
        self.max_iou = 0.0
        self.min_iou = 1.0
        self.num_zero_iou_obj = 0

    def record(self, iou_val: float):
        self.num_objects += 1
        if iou_val <= 0:
            self.min_iou = min(iou_val, self.min_iou)
            self.num_zero_iou_obj += 1
        else:
            self.max_iou = max(iou_val, self.max_iou)
            self.min_iou = min(iou_val, self.min_iou)
            self.avg_ious += iou_val

    def dump(self):
        print('max iou: {}'.format(self.max_iou))
        print('min iou: {}'.format(self.min_iou))
        print('avg iou: {}'.format(
            self.avg_ious / max(self.num_objects, 1)))
        print('number of objects: {}'.format(self.num_objects))
        print('number of objects with 0 iou: {}'.format(
            self.num_zero_iou_obj))


def assign_anchors(gt_bbox: np.ndarray, anchor_box: np.ndarray,
                   stats: Optional[AssignStats] = None
                   ) -> Tuple[List[int], List[List[float]]]:
    """Greedy anchor-target assignment (imdb.py:195-236).

    Per GT box in order: the highest-IoU anchor not yet claimed by an
    earlier box in this image; if every positive-IoU anchor is claimed (or
    all IoUs are zero), the nearest unclaimed anchor by squared distance
    in (cx, cy, w, h) space.  Returns (anchor indices, deltas).
    """
    num_anchors = len(anchor_box)
    aidx_per_image: List[int] = []
    delta_per_image: List[List[float]] = []
    aidx_set = set()
    for i in range(len(gt_bbox)):
        overlaps = batch_iou(anchor_box, gt_bbox[i])
        aidx = num_anchors
        for ov_idx in np.argsort(overlaps)[::-1]:
            if overlaps[ov_idx] <= 0:
                if stats is not None:
                    stats.record(float(overlaps[ov_idx]))
                break
            if ov_idx not in aidx_set:
                aidx_set.add(ov_idx)
                aidx = ov_idx
                if stats is not None:
                    stats.record(float(overlaps[ov_idx]))
                break
        if aidx == num_anchors:
            dist = np.sum(np.square(gt_bbox[i] - anchor_box), axis=1)
            for dist_idx in np.argsort(dist):
                if dist_idx not in aidx_set:
                    aidx_set.add(dist_idx)
                    aidx = dist_idx
                    break

        box_cx, box_cy, box_w, box_h = gt_bbox[i]
        delta = [
            (box_cx - anchor_box[aidx][0]) / anchor_box[aidx][2],
            (box_cy - anchor_box[aidx][1]) / anchor_box[aidx][3],
            float(np.log(box_w / anchor_box[aidx][2])),
            float(np.log(box_h / anchor_box[aidx][3])),
        ]
        aidx_per_image.append(int(aidx))
        delta_per_image.append(delta)
    return aidx_per_image, delta_per_image
