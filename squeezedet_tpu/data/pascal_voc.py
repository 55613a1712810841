"""Pascal VOC dataset wrapper (reference src/dataset/pascal_voc.py).

XML annotations (difficult objects excluded, 0-based pixel coords,
pascal_voc.py:52-79); evaluation writes per-class det files with 1-based
coords and scores AP via ``voc_eval`` with the VOC07 11-point metric for
years < 2010 (pascal_voc.py:81-137).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List

import numpy as np

from squeezedet_tpu.data.imdb import Imdb
from squeezedet_tpu.data.voc_eval import voc_eval
from squeezedet_tpu.ops.boxes import bbox_transform_inv


class PascalVoc(Imdb):
    def __init__(self, image_set: str, year: str, data_path: str, mc,
                 rng=None):
        super().__init__('voc_' + year + '_' + image_set, mc, rng=rng)
        self._year = year
        self._image_set = image_set
        self._data_root_path = data_path
        self._data_path = os.path.join(data_path, 'VOC' + year)
        self._classes = mc.class_names
        self._class_to_idx = dict(zip(self._classes,
                                      range(self.num_classes)))
        self._image_idx = self._load_image_set_idx()
        self._rois = self._load_pascal_annotation()
        self._shuffle_image_idx()

    @property
    def year(self):
        return self._year

    def _load_image_set_idx(self) -> List[str]:
        image_set_file = os.path.join(
            self._data_path, 'ImageSets', 'Main', self._image_set + '.txt')
        assert os.path.exists(image_set_file), \
            'File does not exist: {}'.format(image_set_file)
        with open(image_set_file) as f:
            return [x.strip() for x in f.readlines()]

    def _image_path_at(self, idx: str) -> str:
        image_path = os.path.join(self._data_path, 'JPEGImages',
                                  idx + '.jpg')
        assert os.path.exists(image_path), \
            'Image does not exist: {}'.format(image_path)
        return image_path

    def _load_pascal_annotation(self):
        idx2annotation = {}
        for index in self._image_idx:
            filename = os.path.join(self._data_path, 'Annotations',
                                    index + '.xml')
            tree = ET.parse(filename)
            objs = [obj for obj in tree.findall('object')
                    if int(obj.find('difficult').text) == 0]
            bboxes = []
            for obj in objs:
                bbox = obj.find('bndbox')
                # make pixel indexes 0-based (pascal_voc.py:62-66)
                xmin = float(bbox.find('xmin').text) - 1
                xmax = float(bbox.find('xmax').text) - 1
                ymin = float(bbox.find('ymin').text) - 1
                ymax = float(bbox.find('ymax').text) - 1
                assert 0.0 <= xmin <= xmax, \
                    'Invalid bounding box x-coord xmin {} or xmax {} at ' \
                    '{}.xml'.format(xmin, xmax, index)
                assert 0.0 <= ymin <= ymax, \
                    'Invalid bounding box y-coord ymin {} or ymax {} at ' \
                    '{}.xml'.format(ymin, ymax, index)
                x, y, w, h = bbox_transform_inv([xmin, ymin, xmax, ymax])
                cls = self._class_to_idx[
                    obj.find('name').text.lower().strip()]
                bboxes.append([x, y, w, h, cls])
            idx2annotation[index] = bboxes
        return idx2annotation

    def evaluate_detections(self, eval_dir, global_step, all_boxes):
        """Per-class det files + voc_eval APs (pascal_voc.py:81-137)."""
        det_file_dir = os.path.join(
            eval_dir, 'detection_files_{:s}'.format(str(global_step)))
        os.makedirs(det_file_dir, exist_ok=True)
        det_file_path_template = os.path.join(det_file_dir, '{:s}.txt')

        for cls_idx, cls in enumerate(self._classes):
            with open(det_file_path_template.format(cls), 'wt') as f:
                for im_idx, index in enumerate(self._image_idx):
                    dets = all_boxes[cls_idx][im_idx]
                    for k in range(len(dets)):
                        # VOC expects 1-based indices
                        f.write('{:s} {:.3f} {:.1f} {:.1f} {:.1f} {:.1f}\n'
                                .format(index, dets[k][-1],
                                        dets[k][0] + 1, dets[k][1] + 1,
                                        dets[k][2] + 1, dets[k][3] + 1))

        annopath = os.path.join(self._data_root_path, 'VOC' + self._year,
                                'Annotations', '{:s}.xml')
        imagesetfile = os.path.join(self._data_root_path,
                                    'VOC' + self._year, 'ImageSets',
                                    'Main', self._image_set + '.txt')
        cachedir = os.path.join(self._data_root_path, 'annotations_cache')
        aps = []
        use_07_metric = int(self._year) < 2010
        for cls in self._classes:
            _, _, ap = voc_eval(
                det_file_path_template, annopath, imagesetfile, cls,
                cachedir, ovthresh=0.5, use_07_metric=use_07_metric)
            aps.append(ap)
            print('{:s}: AP = {:.4f}'.format(cls, ap))
        print('Mean AP = {:.4f}'.format(np.mean(aps)))
        return aps, list(self._classes)
