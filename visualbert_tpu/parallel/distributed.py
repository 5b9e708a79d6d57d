"""Multi-host initialization.

The reference has no multi-node story at all (single-process DataParallel,
SURVEY.md §2.3). TPU-native: every host runs the SAME pjit program;
``jax.distributed.initialize`` wires hosts into one runtime, the global mesh
spans all chips (ICI within a slice, DCN between slices), and each host
feeds only its local shard of the batch.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX when the env asks for it; no-op single-host.

    Honors standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID; TPU pods auto-detect when none given)."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and os.environ.get("TPU_WORKER_HOSTNAMES") is None:
        return False  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes
            if num_processes is not None
            else _env_int("JAX_NUM_PROCESSES"),
            process_id=process_id if process_id is not None else _env_int("JAX_PROCESS_ID"),
        )
        return True
    except Exception:
        return False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of the global batch — each host's
    input pipeline feeds only its shard."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch_size % n == 0, (global_batch_size, n)
    per = global_batch_size // n
    return i * per, per
