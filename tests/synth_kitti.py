"""Synthetic KITTI fixture: tiny PNG images + label files so train/eval
run hermetically (the reference has no such fixture — SURVEY §4)."""

from __future__ import annotations

import os

import numpy as np

CLASSES = ("Car", "Pedestrian", "Cyclist")


def make_synth_kitti(root: str, num_images: int = 6, width: int = 320,
                     height: int = 96, seed: int = 0,
                     image_set: str = "train", start_index: int = 0):
    """Create <root>/training/{image_2,label_2} + ImageSets/<set>.txt.

    Each image contains 1-3 colored rectangles with matching KITTI label
    lines (fully visible, level-1 difficulty so nothing is filtered).
    Returns the list of image indices.  ``start_index`` offsets the
    image numbering so disjoint splits (a held-out val set with its own
    seed) can live in one dataset root.
    """
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "training", "image_2")
    lbl_dir = os.path.join(root, "training", "label_2")
    set_dir = os.path.join(root, "ImageSets")
    for d in (img_dir, lbl_dir, set_dir):
        os.makedirs(d, exist_ok=True)

    # class-correlated appearance so classification is learnable:
    # Car = blue-ish wide box, Pedestrian = green-ish tall box,
    # Cyclist = red-ish square box (BGR order)
    base_color = {"Car": (200, 60, 40), "Pedestrian": (40, 200, 60),
                  "Cyclist": (40, 60, 200)}
    indices = []
    for i in range(start_index, start_index + num_images):
        idx = "{:06d}".format(i)
        indices.append(idx)
        im = rng.randint(0, 60, (height, width, 3)).astype(np.uint8)
        lines = []
        for _ in range(rng.randint(1, 4)):
            cls = CLASSES[rng.randint(len(CLASSES))]
            hmax = min(80, height - 4)
            if cls == "Car":
                h = rng.randint(42, min(60, hmax))
                w = rng.randint(70, 95)
            elif cls == "Pedestrian":
                h = rng.randint(60, hmax + 1)
                w = rng.randint(25, 40)
            else:
                h = rng.randint(45, min(70, hmax))
                w = h + rng.randint(-4, 5)
            x1 = rng.randint(0, width - w - 1)
            y1 = rng.randint(0, height - h - 1)
            x2, y2 = x1 + w, y1 + h
            color = tuple(int(np.clip(c + rng.randint(-30, 30), 0, 255))
                          for c in base_color[cls])
            cv2.rectangle(im, (x1, y1), (x2, y2), color, -1)
            # type trunc occl alpha x1 y1 x2 y2 h w l X Y Z ry
            lines.append(
                "{} 0.00 0 0.0 {:.2f} {:.2f} {:.2f} {:.2f} "
                "1.5 1.6 3.7 0.0 1.7 10.0 0.0".format(
                    cls, x1, y1, x2, y2))
        cv2.imwrite(os.path.join(img_dir, idx + ".png"), im)
        with open(os.path.join(lbl_dir, idx + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    with open(os.path.join(set_dir, image_set + ".txt"), "w") as f:
        f.write("\n".join(indices) + "\n")
    return indices
