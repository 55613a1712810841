"""Checkpointing: orbax save/restore + legacy weight importers."""

from squeezedet_tpu.checkpoint.importer import (  # noqa: F401
    load_pretrained,
    load_tf1_checkpoint,
)
from squeezedet_tpu.checkpoint.manager import (  # noqa: F401
    CheckpointManager,
    latest_step,
)
