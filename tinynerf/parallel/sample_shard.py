"""Sample-axis sharding — the volumetric analog of sequence parallelism.

The reference model has no attention; its long axes are rays and
samples-per-ray (SURVEY.md §2.17, §5). For very deep marches the per-ray
sample dimension can be split across devices. Transmittance is a prefix
product ``T_i = exp(-sum_{j<=i} sigma_j delta_j)`` (reference
``nerf.py:267-268``), so cross-device composition needs a per-ray carry: the
exclusive prefix (across devices) of each device's local ``sum(sigma*delta)``
— exchanged in log-space with a ``ppermute`` hop chain, the ring-attention
analog for volume rendering.

Shipped as a working demonstrator (`sharded_get_density`, `sharded_composite`)
with fake-device CPU tests; ray-DP remains the workhorse default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SAMPLE_AXIS = "sample"


def _exclusive_device_prefix_sum(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Exclusive prefix sum of ``x`` across devices on ``axis_name``.

    Hillis–Steele doubling: log2(n) ppermute hops, each shifting partial sums
    one power of two down the ring. Works for any device count (non-power-of-2
    included) because shifted-off-the-end contributions are simply absent.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # start from inclusive = own value, then convert to exclusive at the end
    acc = x
    shift = 1
    while shift < n:
        perm = [(src, src + shift) for src in range(n - shift)]
        received = jax.lax.ppermute(acc, axis_name, perm)
        acc = jnp.where(idx >= shift, acc + received, acc)
        shift *= 2
    # exclusive = inclusive - own
    return acc - x


def sharded_get_density(delta: jnp.ndarray, sigma: jnp.ndarray,
                        axis_name: str = SAMPLE_AXIS) -> jnp.ndarray:
    """Compositing weights when the sample axis is sharded across devices.

    Each device holds a contiguous (B, N_local) chunk of (delta, sigma).
    Matches ``tinynerf.core.render.get_density`` on the concatenation
    (inclusive-cumsum transmittance, reference semantics Q5).
    """
    sigma_delta = delta * sigma
    local_cumsum = jnp.cumsum(sigma_delta, axis=1)           # within-chunk
    local_total = local_cumsum[:, -1]                         # (B,)
    carry = _exclusive_device_prefix_sum(local_total, axis_name)  # (B,)
    transmittance = jnp.exp(-(carry[:, None] + local_cumsum))
    return transmittance * (1.0 - jnp.exp(-sigma_delta))


def sharded_composite(weights: jnp.ndarray, color: jnp.ndarray,
                      axis_name: str = SAMPLE_AXIS) -> jnp.ndarray:
    """sum_i w_i rgb_i with the sample axis sharded: local partial sums then
    one psum over the sample axis. (B, N_local), (B, N_local, 3) -> (B, 3)."""
    partial = jnp.sum(weights[..., None] * color, axis=1)
    return jax.lax.psum(partial, axis_name)
