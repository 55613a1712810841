"""Synthetic Pascal VOC fixture: tiny JPEGs + XML annotations in the
VOC2007 directory layout so VOC train/eval run hermetically (companion
to synth_kitti.py; the reference has no fixtures at all — SURVEY §4)."""

from __future__ import annotations

import os

import numpy as np

CLASSES = ("car", "person", "dog")

_XML = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""
_OBJ = """<object>
    <name>{cls}</name>
    <pose>Unspecified</pose>
    <truncated>0</truncated>
    <difficult>0</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax>\
<ymax>{y2}</ymax></bndbox>
  </object>"""


def make_synth_voc(root: str, num_images: int = 8, width: int = 320,
                   height: int = 192, seed: int = 0,
                   image_set: str = "train", year: str = "2007"):
    """Create <root>/VOC<year>/{Annotations,JPEGImages,ImageSets/Main}.

    Class-correlated appearance (car = blue-ish wide, person = green-ish
    tall, dog = red-ish square, BGR) so classification is learnable.
    Returns the list of image indices.
    """
    import cv2
    rng = np.random.RandomState(seed)
    base = os.path.join(root, "VOC" + year)
    for sub in ("Annotations", "JPEGImages", os.path.join("ImageSets",
                                                          "Main")):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    base_color = {"car": (200, 60, 40), "person": (40, 200, 60),
                  "dog": (40, 60, 200)}
    indices = []
    for i in range(num_images):
        name = "{:06d}".format(i)
        indices.append(name)
        im = rng.randint(0, 60, (height, width, 3)).astype(np.uint8)
        objs = []
        for _ in range(rng.randint(1, 4)):
            cls = CLASSES[rng.randint(len(CLASSES))]
            hmax = min(80, height - 6)
            if cls == "car":
                h = rng.randint(42, min(60, hmax))
                w = rng.randint(70, 95)
            elif cls == "person":
                h = rng.randint(60, hmax + 1)
                w = rng.randint(25, 40)
            else:
                h = rng.randint(45, min(70, hmax))
                w = h + rng.randint(-4, 5)
            # VOC XML coords are 1-based
            x1 = rng.randint(1, width - w - 1)
            y1 = rng.randint(1, height - h - 1)
            x2, y2 = x1 + w, y1 + h
            color = tuple(int(np.clip(c + rng.randint(-30, 30), 0, 255))
                          for c in base_color[cls])
            cv2.rectangle(im, (x1 - 1, y1 - 1), (x2 - 1, y2 - 1), color,
                          -1)
            objs.append(_OBJ.format(cls=cls, x1=x1, y1=y1, x2=x2, y2=y2))
        cv2.imwrite(os.path.join(base, "JPEGImages", name + ".jpg"), im)
        with open(os.path.join(base, "Annotations", name + ".xml"),
                  "w") as f:
            f.write(_XML.format(name=name, w=width, h=height,
                                objects="\n".join(objs)))
    with open(os.path.join(base, "ImageSets", "Main",
                           image_set + ".txt"), "w") as f:
        f.write("\n".join(indices) + "\n")
    return indices
