"""Multi-host initialization helpers.

The reference scales inference over workers via gRPC (SURVEY.md §2.6); the
TPU build scales *training* over hosts with ``jax.distributed`` + one global
mesh: each host contributes its local chips, GSPMD/shard_map place the
user/item shards, and collectives ride ICI within a slice and DCN across
slices. This module wraps the initialization handshake; the training code in
``parallel/sharded.py`` is topology-agnostic once the mesh exists.

This image exposes one chip, so multi-host runs are validated by the
driver's virtual-device dry run; on a real pod slice, call
``init_multihost()`` before any jax usage on every host.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID — or the TPU pod
    metadata that jax auto-detects)."""
    kwargs = {}
    if coordinator_address or os.environ.get("COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["COORDINATOR_ADDRESS"]
        )
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["PROCESS_ID"]
        )
    jax.distributed.initialize(**kwargs)
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    logger.info("multihost initialized: %s", info)
    return info


def global_mesh(model_parallel: int | None = None):
    """Build the global (data, model) mesh over every device of every host."""
    from .mesh import make_mesh

    return make_mesh(model_parallel=model_parallel)
