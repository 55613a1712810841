"""Multi-host initialization.

The reference has no distributed story (single GPU + filesystem
coordination, SURVEY §2.3).  On TPU pods, data parallelism extends
across hosts by initializing the JAX distributed runtime before any
backend use; the mesh helpers then see every chip in the slice and XLA
routes the gradient all-reduce over ICI (intra-slice) / DCN (across
slices).  The checkpoint-dir contract is unchanged — only process 0
writes (orbax handles multi-host arrays natively).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running under a multi-host
    launcher.  No-ops (returns False) in single-process settings.

    With no arguments, TPU pod environments auto-discover via metadata;
    explicit args (or JAX_COORDINATOR_ADDRESS etc.) override.
    """
    import jax

    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    # TPU_WORKER_HOSTNAMES is set even on single-host TPU setups (e.g.
    # 'localhost' under the axon plugin); only a multi-entry list means
    # an actual pod.
    hostnames = [h for h in os.environ.get(
        "TPU_WORKER_HOSTNAMES", "").split(",") if h]
    megascale = os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not megascale and len(hostnames) <= 1:
        return False
    # jax.distributed.initialize() does not read these env vars itself
    # (verified: bare initialize() raises 'Number of processes must be
    # defined'); resolve them here so env-var launched CLI jobs work.
    coordinator_address = coordinator_address or explicit or None
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def is_primary_process() -> bool:
    import jax
    return jax.process_index() == 0
