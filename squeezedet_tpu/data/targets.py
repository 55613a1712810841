"""Dense training-target construction.

The reference densifies per-image sparse annotations into
[B, ANCHORS, .] tensors in ``train._load_data`` (train.py:163-224) using
``sparse_to_dense`` (util.py:139-158), dropping labels whose anchor was
already claimed by an earlier image-local object within the batch entry
(first claim wins, train.py:173-190).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from squeezedet_tpu.models.skeleton import Targets


def dense_targets_from_batch(
        label_per_batch: List[List[int]],
        delta_per_batch: List[List[List[float]]],
        aidx_per_batch: List[List[int]],
        bbox_per_batch: List[np.ndarray],
        *, num_anchors: int, num_classes: int,
        return_num_discarded: bool = False):
    """Build dense [B, A] mask / [B, A, 4] deltas+boxes / [B, A, C] labels.

    Matches train.py:163-224 including duplicate-anchor-claim dropping.
    """
    batch = len(label_per_batch)
    input_mask = np.zeros((batch, num_anchors), np.float32)
    box_delta = np.zeros((batch, num_anchors, 4), np.float32)
    box_input = np.zeros((batch, num_anchors, 4), np.float32)
    labels = np.zeros((batch, num_anchors, num_classes), np.float32)

    num_discarded = 0
    claimed = set()
    for i in range(batch):
        for j in range(len(label_per_batch[i])):
            aidx = aidx_per_batch[i][j]
            if (i, aidx) in claimed:
                num_discarded += 1
                continue
            claimed.add((i, aidx))
            input_mask[i, aidx] = 1.0
            box_delta[i, aidx] = delta_per_batch[i][j]
            box_input[i, aidx] = bbox_per_batch[i][j]
            labels[i, aidx, int(label_per_batch[i][j])] = 1.0

    tg = Targets(input_mask=input_mask, box_delta_input=box_delta,
                 box_input=box_input, labels=labels)
    if return_num_discarded:
        return tg, num_discarded
    return tg


def batch_to_dense_targets(batch_tuple, *, num_anchors: int,
                           num_classes: int
                           ) -> Tuple[np.ndarray, Targets]:
    """Convenience: (imdb.read_batch() output) -> (images [B,H,W,3],
    Targets)."""
    (image_per_batch, label_per_batch, delta_per_batch, aidx_per_batch,
     bbox_per_batch) = batch_tuple
    images = np.stack(image_per_batch).astype(np.float32)
    targets = dense_targets_from_batch(
        label_per_batch, delta_per_batch, aidx_per_batch, bbox_per_batch,
        num_anchors=num_anchors, num_classes=num_classes)
    return images, targets
