"""Data layer: dataset wrappers, batch readers, target builders."""

from squeezedet_tpu.data.imdb import Imdb  # noqa: F401
from squeezedet_tpu.data.kitti import Kitti  # noqa: F401
from squeezedet_tpu.data.pascal_voc import PascalVoc  # noqa: F401
from squeezedet_tpu.data.targets import (batch_to_dense_targets,  # noqa: F401
                                         dense_targets_from_batch)


def imdb_for_dataset(dataset: str, image_set: str, data_path: str, cfg,
                     *, year: str = "2007", rng=None) -> Imdb:
    """Dataset dispatch shared by the train/eval CLIs: ``dataset`` is
    ``KITTI`` or ``VOC``/``PASCAL_VOC`` (the CLI-flag spellings)."""
    if dataset == "KITTI":
        return Kitti(image_set, data_path, cfg, rng=rng)
    assert dataset in ("VOC", "PASCAL_VOC"), dataset
    return PascalVoc(image_set, year, data_path, cfg, rng=rng)
