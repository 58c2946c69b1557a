"""Multi-host (pod / DCN) initialization.

The reference is one process on one device (SURVEY §2); the TPU-native
scale-out across hosts needs exactly one extra step: initialize the JAX
distributed runtime before building meshes, after which every sharded code
path in this package (`make_sharded_frame_fn`, `shard_ensemble`, the
ppermute ring) works unchanged — `jax.devices()` spans the pod, and the
``data`` axis of :func:`pyqmd_tpu.parallel.mesh.make_mesh` lays across DCN
between hosts and ICI within them.

Not exercisable in a single-host environment; the single-process path is a
guarded no-op so the same launcher script runs everywhere.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger("pyqmd_tpu")


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the distributed runtime; returns True if multi-host.

    With no arguments, auto-detects the environment (TPU pod metadata /
    cluster env vars, as ``jax.distributed.initialize`` does). A
    single-process setting is a no-op so launchers need no special-casing.
    """
    if num_processes == 1 or (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and jax.process_count() == 1
    ):
        logger.info("single process; skipping jax.distributed.initialize")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed runtime up: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )
    return True


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's shard of a globally-sharded ensemble —
    for building per-host inputs that `jax.make_array_from_process_local_data`
    assembles into the global array."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    size = global_batch // n
    return jax.process_index() * size, size
