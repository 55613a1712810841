"""Device mesh + sharding helpers.

The reference is single-GPU (``tf.device('/gpu:id')``,
squeezeDet.py:21); its TPU-native equivalent is data parallelism over a
``jax.sharding.Mesh``: parameters and optimizer state replicated, the
batch dimension sharded over the ``data`` axis, XLA inserting the
gradient ``psum`` over ICI automatically when the jitted train step
consumes sharded batches and produces replicated params.

Multi-host: call ``jax.distributed.initialize()`` before building the
mesh and these helpers pick up all processes' devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data", devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def auto_mesh(batch_size: int, axis_name: str = "data") -> Optional[Mesh]:
    """Data-parallel mesh over the largest device count that divides the
    batch; None when that is a single device."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    return Mesh(np.array(devices[:n]), (axis_name,))


def make_mesh_2d(n_data: int, n_spatial: int, devices=None,
                 axis_names=("data", "spatial")) -> Mesh:
    """2-D mesh for combined data x spatial parallelism.

    The ``spatial`` axis shards the image *height* dimension of the
    activations; XLA's SPMD partitioner inserts the halo exchanges
    (``collective-permute`` of the kernel-overlap rows over ICI) that
    convolutions and pools need at shard boundaries, and gathers the
    feature map only at the detection head where per-anchor tensors are
    formed.  Verified bit-exact against the unsharded forward pass
    (tests/test_spatial.py).  Use for small-batch / low-latency serving
    and for scaling training past the point where the per-device batch
    would drop below one image.
    """
    if devices is None:
        devices = jax.devices()
    n = n_data * n_spatial
    assert len(devices) >= n, (
        "need {} devices for a {}x{} mesh, have {}".format(
            n, n_data, n_spatial, len(devices)))
    return Mesh(np.array(devices[:n]).reshape(n_data, n_spatial),
                axis_names)


def make_mesh_spatial(n_h: int, n_w: int = 1, devices=None) -> Mesh:
    """Pure spatial mesh: image height over ``spatial`` and width over
    ``spatial_w`` (no data axis — the batch stays whole, e.g. the
    reference's batch-1 eval protocol, eval.py:150-166).  XLA's SPMD
    partitioner inserts halo exchanges along both axes at conv/pool
    shard boundaries."""
    if devices is None:
        devices = jax.devices()
    n = n_h * n_w
    assert len(devices) >= n, (
        "need {} devices for a {}x{} spatial mesh, have {}".format(
            n, n_h, n_w, len(devices)))
    return Mesh(np.array(devices[:n]).reshape(n_h, n_w),
                ("spatial", "spatial_w"))


def spatial_factors(n: int, height: int, width: int,
                    stride: int = 16) -> tuple:
    """Largest (n_h, n_w) with n_h * n_w <= n such that every
    stride-halving conv stage divides evenly over both spatial axes
    (H % (stride * n_h) == 0 and W % (stride * n_w) == 0 implies every
    intermediate H/2^k, W/2^k does too, for nets whose downsamplings
    are exact halvings to total ``stride``).

    Used by the int8 eval path: XLA's SPMD partitioner mis-types the
    zero-pad broadcast it inserts for UNEVEN splits of an s8 conv
    (hlo_verifier RET_CHECK SameElementType), so int8 spatial eval only
    runs on factorizations that never need padding.  Returns (1, 1)
    when no multi-device split qualifies.  Ties prefer the larger n_h
    (height halos were the round-3 default and the flagship geometry's
    384 rows split that way).
    """
    best = (1, 1)
    for n_h in range(1, n + 1):
        if height % (stride * n_h):
            continue
        for n_w in range(1, n // n_h + 1):
            if width % (stride * n_w):
                continue
            if n_h * n_w >= best[0] * best[1]:
                best = (n_h, n_w)
    return best


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_axis_size(mesh: Optional[Mesh]) -> int:
    """Extent of the mesh's ``data`` axis (1 when absent or no mesh)."""
    if mesh is None:
        return 1
    return int(mesh.shape.get("data", 1))


def dataset_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the device-resident canvas stack [N, H0, W0, 3]:
    rows over ``data`` (each data-parallel device holds its own
    1/D slice of the split — imdb.shard_data's shard-major padded
    layout), replicated over any spatial axes."""
    names = mesh.axis_names
    return NamedSharding(mesh, P("data" if "data" in names else None))


def local_data_coords(mesh: Mesh):
    """This process's coordinates along the mesh ``data`` axis.

    Used by multihost --device_dataset: host p decodes and uploads the
    canvas shards for exactly these coordinates (imdb.load_canvas_shards)
    and feeds their slots of the global batch.  Every coordinate's
    devices must belong to ONE process (a data shard striped across
    hosts would make 'its' canvas rows unownable) and the coordinates
    must be contiguous (the make_array_from_process_local_data contract:
    per-process local blocks concatenate in process order).
    """
    names = mesh.axis_names
    if "data" not in names:
        return [0]
    ax = names.index("data")
    dev = np.moveaxis(mesh.devices, ax, 0)
    dev = dev.reshape(dev.shape[0], -1)
    pid = jax.process_index()
    coords = []
    for i, row in enumerate(dev):
        procs = {d.process_index for d in row}
        if len(procs) > 1:
            raise ValueError(
                "data-axis coordinate {} spans processes {}; "
                "--device_dataset needs each data shard's devices on "
                "one host (reorder the mesh so 'data' is the "
                "process-major axis)".format(i, sorted(procs)))
        if procs.pop() == pid:
            coords.append(i)
    if not coords:
        raise ValueError(
            "process {} owns no devices on the mesh's data axis — "
            "--device_dataset requires every participating controller "
            "to hold at least one data shard (is the mesh built over a "
            "device subset that excludes this host?)".format(pid))
    if coords != list(range(coords[0], coords[0] + len(coords))):
        raise ValueError(
            "process-local data coordinates {} are not contiguous "
            "(make_array_from_process_local_data needs per-process "
            "blocks that concatenate in process order)".format(coords))
    return coords


def local_shard_gather(mesh: Mesh, dataset, pos):
    """Gather canvas rows from a dataset stack sharded over ``data``.

    ``dataset`` is [D*rows, H0, W0, 3] with :func:`dataset_sharding`
    (device at data-coordinate s holds rows [s*rows, (s+1)*rows));
    ``pos`` is [B] global row positions sharded over ``data`` whose
    values are guaranteed in-shard by imdb.shard_data's per-shard
    sampler (slot group s only references shard s's rows).  The gather
    is therefore purely local — shard_map rebases the global positions
    by the device's data coordinate and takes from the local block; no
    collective is emitted (asserted on the HLO in test_train).
    """
    import jax.numpy as jnp
    d = data_axis_size(mesh)
    rows = dataset.shape[0] // d
    names = mesh.axis_names

    def body(ds_local, pos_local):
        start = jax.lax.axis_index("data") * rows if d > 1 else 0
        return jnp.take(ds_local, pos_local - start, axis=0)

    spec = P("data" if "data" in names else None)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                         out_specs=spec)(dataset, pos)


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC image batches: batch over ``data``, height
    over ``spatial``, width over ``spatial_w`` — whichever axes the
    mesh has."""
    names = mesh.axis_names
    return NamedSharding(mesh, P(
        "data" if "data" in names else None,
        "spatial" if "spatial" in names else None,
        "spatial_w" if "spatial_w" in names else None))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def stacked_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for [K, B, ...] scan-stacked batches
    (--steps_per_dispatch): the scan axis replicated, the batch
    dimension over ``data`` — matching the scanned train step's
    in_shardings (trainer.make_train_step_device_scan)."""
    return NamedSharding(mesh, P(None, axis_name))


def stacked_image_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, H, W, C] scan-stacked images: scan axis replicated, batch
    over ``data``, height over ``spatial`` when the mesh has one."""
    names = mesh.axis_names
    return NamedSharding(mesh, P(
        None, "data", "spatial" if "spatial" in names else None))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Device-put a host batch pytree with its leading dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_images(mesh: Mesh, images):
    """Device-put an NHWC image batch with :func:`image_sharding` —
    batch over ``data`` plus height over ``spatial`` when present, so
    the placement already matches a 2-D train step's in_shardings and
    jit inserts no per-step reshard copy."""
    return jax.device_put(images, image_sharding(mesh))


def shard_images_multihost(mesh: Mesh, images):
    """Multi-process variant of :func:`shard_images` (each process
    passes its local batch shard)."""
    return jax.make_array_from_process_local_data(
        image_sharding(mesh), np.asarray(images))


def shard_batch_multihost(mesh: Mesh, tree, axis_name: str = "data"):
    """Multi-process variant of :func:`shard_batch`.

    Each process passes its *local* slice of the batch (the data loader
    on every host reads a disjoint shard); the result is a global array
    whose leading dim spans all processes' shards over ``axis_name``.
    Works single-process too (then it equals shard_batch).
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def replicate_multihost(mesh: Mesh, tree):
    """Fully replicate a pytree over every device of a (possibly
    multi-process) mesh; every process must pass the same values (e.g.
    params built from one seed, or restored from one checkpoint)."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)
