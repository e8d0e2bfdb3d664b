"""Ray-data-parallelism over a ``jax.sharding.Mesh``.

The reference has **no** distributed code of any kind (SURVEY.md §2.17); this
module is the framework part of the rebuild. Two interchangeable paths:

1. **pjit / sharding-constraint (default):** the jitted train step constrains
   the sampled ray batch to ``P("data")``; XLA partitions the whole program
   and inserts the gradient ``psum`` itself, riding ICI. Params, optimizer
   state and the pixel/pose tables stay replicated (0.6 M params — TP/PP are
   out of scope by design, SURVEY.md §2.17).
2. **explicit shard_map:** the same loss with hand-placed ``psum`` — used as
   the correctness oracle (sharded grads must equal single-device grads) and
   as the template for the sample-axis demonstrator in ``sample_shard.py``.

Multi-host (pods) joins via ``jax.distributed.initialize`` over DCN before
mesh construction; both paths below are host-count agnostic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinynerf.config import Config
from tinynerf.data.rays import RayBatch

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over the ray axis (first ``num_devices`` local devices)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (ray) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_state(state, mesh: Mesh):
    """Place a TrainState (or any pytree) replicated on every mesh device.
    Works on meshes spanning multiple processes (pod path): device_put
    cannot target non-addressable devices, so the cross-process case goes
    through the callback-based placement in ``distributed.put_replicated``."""
    if jax.process_count() > 1:
        from tinynerf.parallel.distributed import put_replicated
        return put_replicated(state, mesh)
    return jax.device_put(state, replicated(mesh))


def make_shardmap_grad_fn(loss_fn, mesh: Mesh, axis: str = DATA_AXIS):
    """Explicit-SPMD gradient: each device computes grads on its ray shard,
    then ``psum`` over ICI. Equivalent to the pjit path; kept as the explicit
    reference implementation (and exercised by the fake-device tests).

    Returns ``grad_fn(params, batch, key) -> (loss, grads)`` where ``batch``
    leading dims must be divisible by the mesh size.
    """

    def local_grad(params, batch, key):
        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        return (jax.lax.psum(loss, axis),
                jax.lax.psum(grads, axis))

    sharded = jax.shard_map(
        local_grad, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False)

    def grad_fn(params, batch: RayBatch, key):
        return sharded(params, batch, key)

    return grad_fn


def sharded_render_chunk(render_fn, mesh: Mesh, axis: str = DATA_AXIS):
    """Wrap a (params, rows, cols, pose17) -> rgb renderer so pixel chunks are
    sharded over the mesh and gathered back — the full-frame eval path at pod
    scale. With the pjit path this is just sharding constraints on the inputs.
    """
    bsh = batch_sharding(mesh, axis)

    @jax.jit
    def wrapped(params, rows, cols, pose17):
        rows = jax.lax.with_sharding_constraint(rows, bsh)
        cols = jax.lax.with_sharding_constraint(cols, bsh)
        pose17 = jax.lax.with_sharding_constraint(pose17, bsh)
        return render_fn(params, rows, cols, pose17)

    return wrapped


def make_mesh_2d(n_data: int, n_sample: int, data_axis: str = DATA_AXIS,
                 sample_axis: str = "sample") -> Mesh:
    """2-D (data x sample) mesh: rays shard over ``data_axis``, the fine
    sample axis over ``sample_axis`` (deep-march path, SAMPLE_SHARD)."""
    devices = np.asarray(jax.devices()[: n_data * n_sample]).reshape(
        n_data, n_sample)
    return Mesh(devices, (data_axis, sample_axis))


def mesh_for_config(cfg: Config) -> Optional[Mesh]:
    """Build the mesh a config asks for; None when single-device.
    ``SAMPLE_SHARD > 1`` folds a sample axis into a 2-D mesh; the train
    step still shards only rays (P("data")), while the eval/render path
    additionally spreads deep fine marches over the sample axis."""
    n = cfg.mesh_shape if cfg.mesh_shape is not None else len(jax.devices())
    if n <= 1:
        return None
    ss = getattr(cfg, "sample_shard", 0) or 0
    if ss > 1:
        if n % ss != 0:
            raise ValueError(
                f"SAMPLE_SHARD={ss} must divide the device count {n}")
        return make_mesh_2d(n // ss, ss)
    return make_mesh(n)
