"""Data layer: dataset wrappers, batch readers, target builders."""

from squeezedet_tpu.data.imdb import Imdb  # noqa: F401
from squeezedet_tpu.data.kitti import Kitti  # noqa: F401
from squeezedet_tpu.data.pascal_voc import PascalVoc  # noqa: F401
from squeezedet_tpu.data.targets import (batch_to_dense_targets,  # noqa: F401
                                         dense_targets_from_batch)
