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

    if coordinator is None and (num_processes is None or num_processes <= 1):
        # single-process run (or TPU pod with full autodetection);
        # NUM_PROCESSES=1 without a coordinator is explicitly single-process
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


def is_main_process() -> bool:
    """True on the process that owns artifact writes (checkpoints, videos,
    previews, metric logs). Single-process runs are always main."""
    import jax
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    import jax
    return jax.process_count() > 1


def put_replicated(tree, mesh):
    """Place a host pytree fully replicated on every device of ``mesh`` —
    including meshes that span multiple processes.

    ``jax.device_put`` cannot target non-addressable devices, so across
    processes each host materializes its (identical) full copy through
    ``jax.make_array_from_callback``, which only ever touches local devices
    and assembles the global replicated Array. Every process must call this
    with the same values (true for params/tables built from the same seed
    and scene files — asserted nowhere, by construction).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, tree)


def barrier(name: str = "tinynerf") -> None:
    """Cross-process sync point (no-op single-process). Besides ordering,
    this establishes the CPU gloo / TPU collective context with a
    trivially-compiled program BEFORE the first heavy train-step compile:
    without it, two processes compiling a large program on busy hosts can
    reach the first real collective more than the context-initialization
    deadline apart and abort the job."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def to_host(x):
    """Materialize a jax Array on the host, tolerating multi-process
    shardings: fully-addressable (or fully-replicated) arrays convert
    directly; otherwise only this process's shards are concatenated along
    axis 0 (best-effort — used for preview/metric reads where a local view
    is acceptable)."""
    import numpy as np

    if getattr(x, "is_fully_addressable", True) or getattr(
            x, "is_fully_replicated", False):
        return np.asarray(x)
    # one shard per distinct index: on a 2-D (data x sample) mesh each data
    # block is replicated across the sample axis, and concatenating every
    # addressable shard would duplicate it
    by_index = {}
    for s in x.addressable_shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        by_index.setdefault(key, s)
    shards = sorted(by_index.values(), key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
