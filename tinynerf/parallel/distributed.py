"""Multi-host (pod) initialization over DCN.

The reference has no distributed backend at all (SURVEY.md §2.17: no
torch.distributed/NCCL/MPI). The TPU-native story: within a slice, XLA
collectives ride ICI automatically once a Mesh spans the devices; across
hosts, ``jax.distributed.initialize`` joins processes over DCN, after which
``jax.devices()`` sees the full pod and the existing mesh/pjit code in
``tinynerf/parallel/mesh.py`` is unchanged.

Call :func:`maybe_initialize` once at process start (the CLI does). It is a
no-op for single-process runs, resolves its configuration from the standard
env vars (``COORDINATOR_ADDRESS``, ``NUM_PROCESSES``, ``PROCESS_ID`` — or
the Cloud TPU metadata that jax autodetects), and is idempotent.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join the multi-host job if one is configured; returns True if a
    multi-process runtime is active afterwards."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_str = os.environ.get("NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None)
    pid_str = os.environ.get("PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None)

    if coordinator is None and num_processes is None:
        # single-process run (or TPU pod with full autodetection)
        _initialized = True
        return False

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def process_info() -> dict:
    import jax
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}
