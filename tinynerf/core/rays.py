"""Device-side ray generation: pixel -> camera -> world.

Replaces the reference's in-forward geometry (``nerf.py:179-216`` plus
``poses_extract`` at ``nerf.py:52-67`` and the K-inverse at ``nerf.py:433``)
with a pure-jnp ray caster that runs inside the jitted step.

Preserved reference semantics (SURVEY.md):
- Q12: the model receives (row, column) and feeds them as (x, y) into the
  intrinsics — a transposed-image convention (``nerf.py:343-344,186-189``);
  benign on square frames, reproduced exactly.
- Q13: sample positions are ``origin + t * unit_dir`` so t is **Euclidean
  distance** from the camera origin, not z-depth (``nerf.py:197-200``). The
  reference's redundant per-point 4x4 matmul (``nerf.py:205-208``) is folded
  into the algebraically identical ``origin + t * (R @ d_cam)``.
- pixel -> camera mapping ``x_c = x - 0.5W, y_c = -y + 0.5H, z_c = -f``
  (``nerf.py:433``, comment at ``nerf.py:193``).
- per-ray near/far come from columns 15:17 of the 17-vector
  (``nerf.py:58-59``); h/w/f live in column 4 of the reshaped (3,5) pose
  (``nerf.py:64-66``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def make_k_inv(height: float, width: float, focal: float) -> jnp.ndarray:
    """Transposed inverse-intrinsics so that ``(x, y, 1) @ K_inv`` maps pixel to
    camera coords (reference ``nerf.py:433``)."""
    return jnp.array(
        [[1.0, 0.0, 0.0],
         [0.0, -1.0, 0.0],
         [-0.5 * width, 0.5 * height, -focal]],
        dtype=jnp.float32,
    )


def poses_extract(pose17: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Split the per-ray 17-vector into (c2w (B,3,4), near (B,), far (B,)).

    Row layout (reference ``loader.py:33``): ``[3x4 c2w | h w f column]``
    flattened (15 numbers) + ``[near, far]``.
    """
    pose = pose17[:, :15].reshape(-1, 3, 5)
    c2w = pose[:, :, :4]
    near = pose17[:, 15]
    far = pose17[:, 16]
    return c2w, near, far


def pixels_to_rays(rows: jnp.ndarray, cols: jnp.ndarray, pose17: jnp.ndarray,
                   k_inv: jnp.ndarray,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(rows (B,), cols (B,), pose17 (B,17)) -> (origins, unit dirs, near, far).

    Matches the reference ray stack bit-for-bit in exact arithmetic, without
    the per-point homogeneous matmul.
    """
    c2w, near, far = poses_extract(pose17)
    dtype = k_inv.dtype
    xy_hom = jnp.stack(
        [rows.astype(dtype), cols.astype(dtype), jnp.ones_like(rows, dtype=dtype)],
        axis=-1,
    )  # (B, 3) — (row, col, 1): Q12 transposition preserved
    # geometry matmuls are pinned to full f32 precision: XLA's TPU default
    # runs f32 dots at bf16 precision, and the resulting ~0.4% ray-direction
    # error is enough supervision inconsistency to collapse training at high
    # LR (verified: identical config converges on CPU, diverges to black on
    # TPU without this). These are (B,3)x(3,3) ops — HIGHEST costs nothing.
    d_cam = jnp.matmul(xy_hom, k_inv, precision=jax.lax.Precision.HIGHEST)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    rot = c2w[:, :3, :3].astype(dtype)
    origins = c2w[:, :3, 3].astype(dtype)
    d_world = jnp.einsum("bij,bj->bi", rot, d_cam,
                         precision=jax.lax.Precision.HIGHEST)
    return origins, d_world, near.astype(dtype), far.astype(dtype)


def ndc_rays(height: float, width: float, focal: float, near: float,
             origins: jnp.ndarray, dirs: jnp.ndarray,
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard NeRF NDC warp for forward-facing (LLFF) scenes — an opt-in
    capability the reference lacks (SURVEY.md Q10, decision D1: opt-in).

    Shifts origins to the near plane and maps the viewing frustum to the
    [-1, 1]^3 cube; after the warp rays march t in [0, 1].
    """
    # shift origins to the near plane: o' = o + ((n - o_z) / d_z) d   (z is "back")
    t_shift = -(near + origins[..., 2]) / dirs[..., 2]
    origins = origins + t_shift[..., None] * dirs

    ox, oy, oz = origins[..., 0], origins[..., 1], origins[..., 2]
    dx, dy, dz = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    o0 = -focal / (0.5 * width) * ox / oz
    o1 = -focal / (0.5 * height) * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = -focal / (0.5 * width) * (dx / dz - ox / oz)
    d1 = -focal / (0.5 * height) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz
    return (jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1))
