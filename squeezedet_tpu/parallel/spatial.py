"""Spatial partitioning: shard the image height over a mesh axis.

The reference is single-GPU and has no model-parallel story; on TPU the
natural model-parallel axis for a fully-convolutional detector is
*spatial*: split the activations' height dimension over a ``spatial``
mesh axis and let XLA's SPMD partitioner insert the halo exchanges
(``collective-permute`` of the kernel-overlap rows over ICI) that every
conv/pool needs at shard boundaries.  The feature map is gathered only
at the detection head where per-anchor tensors are formed — a small
tensor relative to the backbone activations.

Use cases:
- latency-bound serving: batch-1 inference sharded over a slice's chips
  instead of idling all but one;
- large custom resolutions (config/kitti.py:grid_for_net) whose
  activations would not fit one chip's HBM;
- training when scaling past batch-per-device=1 on the data axis.

Bit-exactness vs the unsharded program is pinned by
tests/test_spatial.py on a virtual CPU mesh; combined data x spatial
training goes through ``trainer.make_train_step(mesh=make_mesh_2d(...))``
and is exercised by the driver dryrun (parallel/dryrun.py).
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from squeezedet_tpu.parallel.mesh import image_sharding, replicated_sharding


def spatial_predict_fn(det, mesh, postprocess: bool = True,
                       uint8_input: bool = False) -> Callable:
    """Jitted forward pass with the image height sharded over the mesh's
    ``spatial`` axis (and batch over ``data`` if present).

    Returns ``fn(params, images)``; ``params`` may be host arrays (they
    are replicated by the jit's in_shardings) and outputs are fully
    replicated.  With ``postprocess`` the program includes the on-device
    top-K + NMS (ops/postprocess.py); otherwise it returns the raw
    interpretation tuple ``(det_boxes, det_probs, det_class)``.
    """
    rep = replicated_sharding(mesh)
    imgs = image_sharding(mesh)

    def fn(params, images):
        if uint8_input:
            interp = det.predict_raw(params, images)
        else:
            interp = det.predict(params, images)
        if not postprocess:
            return interp.det_boxes, interp.det_probs, interp.det_class
        return det.postprocess_device(interp)

    return jax.jit(fn, in_shardings=(rep, imgs), out_shardings=rep)
