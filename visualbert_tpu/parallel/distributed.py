"""Multi-host initialization.

The reference has no multi-node story at all (single-process DataParallel,
``visualbert/models/model_wrapper.py:146``; SURVEY.md §2.3). TPU-native:
every host runs the SAME pjit program; ``jax.distributed.initialize`` wires
hosts into one runtime, the global mesh spans all chips (ICI within a slice,
DCN between slices), and each host feeds only its local slice of the batch
(``Batcher(process_shard=...)`` → ``Trainer.shard_batch`` assembles global
arrays with ``jax.make_array_from_process_local_data``).

Launch recipe: docs/DISTRIBUTED.md.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from visualbert_tpu.utils.logging import get_logger

log = get_logger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX when the environment asks for it; no-op on
    a single host. Returns True when a multi-process runtime came up.

    Honors the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID; TPU pods auto-detect when none
    given). An EXPLICITLY configured launch (coordinator address given, or a
    multi-host TPU_WORKER_HOSTNAMES) that fails to initialize raises —
    silently degrading to single-host would train a private copy per host.
    A single-entry TPU_WORKER_HOSTNAMES (single TPU VM; also set by test
    sandboxes) probes best-effort and falls back to single-host."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES")
    if coordinator_address is None and hostnames is None:
        return False  # single host
    strict = coordinator_address is not None or (
        hostnames is not None and len(hostnames.split(",")) > 1
    )
    num_processes = (
        num_processes if num_processes is not None else _env_int("JAX_NUM_PROCESSES")
    )
    process_id = process_id if process_id is not None else _env_int("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        if strict:
            raise
        log.warning(
            "jax.distributed auto-detect failed on a single-host "
            "TPU_WORKER_HOSTNAMES=%s — continuing single-host", hostnames
        )
        return False
    log.info(
        "jax.distributed up: process %d/%d, %d global / %d local devices",
        jax.process_index(), jax.process_count(),
        len(jax.devices()), len(jax.local_devices()),
    )
    return jax.process_count() > 1


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_shard() -> Optional[Tuple[int, int]]:
    """(process_index, process_count) for Batcher(process_shard=...), or
    None single-host."""
    n = jax.process_count()
    return (jax.process_index(), n) if n > 1 else None


def local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this host's contiguous slice of the global batch —
    each host's input pipeline feeds only its shard. Matches the slice
    ``Batcher(process_shard=...)`` takes and the device order of
    ``parallel.mesh.create_mesh`` (jax.devices() is process-major)."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch_size % n == 0, (global_batch_size, n)
    per = global_batch_size // n
    return i * per, per
