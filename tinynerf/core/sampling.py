"""Sample placement along rays: coarse uniform t's + hierarchical inverse-CDF.

The reference resampler (``nerf.py:225-261``) does a GPU->CPU->GPU round trip
**inside every forward** to build its uniform CDF levels with host numpy
(``nerf.py:240-246``) — the single biggest throughput bug in the reference
(SURVEY.md §3.2, Q8). Here the whole thing is pure jnp and runs inside the
jitted step on device.

Semantics kept from the reference (decision D2/D3 in SURVEY.md §2.16):
- coarse t's are a deterministic inclusive linspace(near, far, N_c) per ray
  (``nerf.py:288``); optional stratified jitter is a config flag (Q7);
- fine levels are N_f+2 uniform points between the per-ray CDF min and max
  with both ends dropped — uniform, NOT stratified-random (``nerf.py:243-246``);
- gradients are NOT detached: fine-loss grads flow into coarse sigma through
  the gathered CDF values, exactly as in the reference (``nerf.py:256``);
- interpolation uses ``slope_inv = delta / (dense[:, 1:] + 1e-7)``
  (``nerf.py:239``) — but with **per-ray** delta rather than ray 0's spacing
  (reference bug for per-ray near/far, fixed per D3);
- out-of-range bin indices are clamped instead of the reference's
  ``print + exit(0)`` (``nerf.py:251-253``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPSILON = 1e-7


def coarse_ts(near: jnp.ndarray, far: jnp.ndarray, n_coarse: int,
              key: Optional[jax.Array] = None) -> jnp.ndarray:
    """(B,) near/far -> (B, N_c) sample distances.

    Deterministic inclusive linspace matching ``np.linspace(near, far, N_c)``
    (reference ``nerf.py:288``). If ``key`` is given, adds stratified jitter
    within each bin (opt-in upgrade; reference has none, Q7).
    """
    frac = jnp.linspace(0.0, 1.0, n_coarse, dtype=near.dtype)  # (N_c,)
    ts = near[:, None] + (far - near)[:, None] * frac[None, :]
    if key is not None:
        # jitter within the linspace spacing, keeping t in [near, far]
        spacing = ((far - near) / (n_coarse - 1))[:, None]
        jitter = jax.random.uniform(key, ts.shape, ts.dtype)
        ts = jnp.minimum(ts + jitter * spacing, far[:, None])
    return ts


def resample(t_coarse: jnp.ndarray, dense_coarse: jnp.ndarray,
             delta_coarse: jnp.ndarray, n_fine: int) -> jnp.ndarray:
    """On-device inverse-CDF hierarchical resampling.

    Args:
      t_coarse: (B, N_c) coarse sample distances (sorted per ray).
      dense_coarse: (B, N_c) coarse compositing weights (>= 0).
      delta_coarse: (B,) per-ray coarse spacing ``(far - near) / N_c``.
      n_fine: number of fine samples N_f.

    Returns: (B, N_f) fine sample distances, sorted per ray (CDF levels are
    monotone and the CDF is nondecreasing, so the output is sorted by
    construction — which the combined-pass merge relies on).
    """
    cdf = jnp.cumsum(dense_coarse, axis=1)  # (B, N_c), nondecreasing
    high = jnp.max(cdf, axis=1)  # (B,)
    low = jnp.min(cdf, axis=1)

    # N_f + 2 uniform levels between per-ray [low, high]; drop both endpoints
    # (reference nerf.py:243-246, computed there on the host with numpy).
    frac = (jnp.arange(1, n_fine + 1, dtype=cdf.dtype) / (n_fine + 1))  # (N_f,)
    t_inv = low[:, None] + (high - low)[:, None] * frac[None, :]  # (B, N_f)

    # index of the CDF bin directly below each level (torch.searchsorted - 1,
    # reference nerf.py:248). searchsorted with side='left' is exactly
    # "count of cdf entries < level"; computed as a branchless batched
    # comparison reduction — one (B, N_c, N_f) compare+sum, which XLA tiles
    # onto the VPU with no scan/scatter (SURVEY §7 "searchsorted lowers
    # poorly"). Clamp replaces the reference's print+exit(0) guard.
    idx = jnp.sum(
        (cdf[:, :, None] < t_inv[:, None, :]).astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, t_coarse.shape[1] - 1)

    # local inverse slope of the CDF; the last column is padded with 0 exactly
    # like the reference's zero column (nerf.py:257).
    slope_inv = delta_coarse[:, None] / (dense_coarse[:, 1:] + EPSILON)
    slope_inv = jnp.concatenate(
        [slope_inv, jnp.zeros_like(slope_inv[:, :1])], axis=1)  # (B, N_c)

    lower_t = jnp.take_along_axis(t_coarse, idx, axis=1)
    lower_cdf = jnp.take_along_axis(cdf, idx, axis=1)  # grads flow (Q8)
    lower_slope = jnp.take_along_axis(slope_inv, idx, axis=1)
    return lower_t + (t_inv - lower_cdf) * lower_slope


def merge_sorted_ts(t_coarse: jnp.ndarray, t_fine: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-ray sorted t arrays -> indices into their concatenation.

    Both inputs are sorted by construction (coarse: linspace; fine: monotone
    CDF levels through a nondecreasing inverse-CDF), so a full sort of the
    concatenation is overkill; argsort of the concat still lowers to one XLA
    sort, which is what we use — returned as gather indices so t, rgb and
    sigma stay **coupled** (fixing reference bug Q4, where ``torch.sort`` on
    the (t, rgb, sigma) bundle sorts each channel independently,
    ``nerf.py:308``).
    """
    t_all = jnp.concatenate([t_coarse, t_fine], axis=1)
    order = jnp.argsort(t_all, axis=1)
    return t_all, order
