"""Device-resident pixel/pose tables + on-device batch sampling.

The reference streams ray batches through a 4-worker torch DataLoader
(``nerf.py:424``, ``loader.py:119-133``), crossing the host/device boundary
every iteration. Here the flattened pixel table (N_pic*H*W, 3) and the tiny
pose table (N_pic, 17) are shipped to HBM **once**; each training step draws
batch indices with the on-device PRNG and gathers rows inside the jitted
step, so sampling costs no host round-trip and composes with pjit sharding.

Index semantics match the reference exactly (``loader.py:119-133``):
``idx = pic * H * W + row * W + col`` — flattening order W -> H -> N_pic.

Memory options for large scenes:
- ``pixel_dtype="u8"`` stores the HBM table quantized (4x smaller),
  dequantized to float32 at gather time;
- ``device_pixels=False`` keeps pixels host-side for the C++ prefetcher path
  (``tinynerf/data/native.py``) when the table exceeds HBM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf.data.poses import SceneData


class RayBatch(NamedTuple):
    """One training batch — the device-side analog of the reference
    DataLoader's ``(row, column, pix_val, poses_bound, pic)`` tuple
    (``loader.py:133``)."""

    rows: jnp.ndarray    # (B,) float32 pixel row
    cols: jnp.ndarray    # (B,) float32 pixel column
    rgb: jnp.ndarray     # (B, 3) float32 ground-truth color
    pose17: jnp.ndarray  # (B, 17) float32 camera row [3x4 c2w | hwf] + [near, far]
    pic: jnp.ndarray     # (B,) int32 source image index


class RayTable:
    """Flattened pixel + pose tables with an on-device uniform sampler.

    Plays the role of the reference ``NeRFDataset`` + ``DataLoader``
    (``loader.py:61-133``, ``nerf.py:424``) as a pure-jax structure whose
    ``sample``/``gather`` trace into the jitted train step.
    """

    def __init__(self, scene: SceneData, pixel_dtype: str = "f32",
                 device_pixels: bool = True, mesh=None):
        """``mesh``: replicate the device tables over this Mesh instead of
        the default device — REQUIRED when the mesh spans multiple processes
        (a pod), where single-device arrays cannot feed a global computation
        (every process builds the same tables from the same scene files)."""
        if pixel_dtype not in ("f32", "u8"):
            raise ValueError(f"pixel_dtype must be 'f32' or 'u8', got {pixel_dtype!r}")
        self.height = int(scene.height)
        self.width = int(scene.width)
        self.focal = float(scene.focal)
        self.num_pics = int(scene.images.shape[0])
        self.pic_size = self.height * self.width
        self.num_pix = self.num_pics * self.pic_size
        self.pixel_dtype = pixel_dtype

        flat = np.ascontiguousarray(
            scene.images.reshape(self.num_pix, 3), dtype=np.float32)
        if pixel_dtype == "u8":
            flat = np.clip(np.rint(flat * 255.0), 0, 255).astype(np.uint8)
        # host copy retained for the native prefetcher and image() readback
        self.host_pixels = flat
        if mesh is not None:
            from tinynerf.parallel.distributed import put_replicated
            placed = put_replicated(
                {"pix": flat if device_pixels else np.zeros((0, 3), flat.dtype),
                 "poses": np.asarray(scene.poses_bounds, np.float32)}, mesh)
            self.pixels = placed["pix"] if device_pixels else None
            self.poses = placed["poses"]
        else:
            self.pixels = jnp.asarray(flat) if device_pixels else None
            self.poses = jnp.asarray(scene.poses_bounds, dtype=jnp.float32)

    def _dequant(self, rgb: jnp.ndarray) -> jnp.ndarray:
        if self.pixel_dtype == "u8":
            return rgb.astype(jnp.float32) * (1.0 / 255.0)
        return rgb

    def gather(self, idx: jnp.ndarray) -> RayBatch:
        """Flat pixel indices -> RayBatch (traceable; reference
        ``loader.py:119-133`` index arithmetic)."""
        if self.pixels is None:
            raise RuntimeError(
                "RayTable was built with device_pixels=False (host-feed "
                "path); use the native ray store for batch sampling.")
        idx = idx.astype(jnp.int32)
        pic = idx // self.pic_size
        in_pic = idx % self.pic_size
        rows = (in_pic // self.width).astype(jnp.float32)
        cols = (in_pic % self.width).astype(jnp.float32)
        rgb = self._dequant(self.pixels[idx])
        pose17 = self.poses[pic]
        return RayBatch(rows=rows, cols=cols, rgb=rgb, pose17=pose17,
                        pic=pic)

    def sample(self, key: jax.Array, batch: int) -> RayBatch:
        """Uniform-with-replacement batch draw — the on-device replacement for
        the DataLoader's shuffled epoch permutation (SURVEY.md §2.3)."""
        idx = jax.random.randint(key, (batch,), 0, self.num_pix)
        return self.gather(idx)

    def image(self, pic: int) -> np.ndarray:
        """Ground-truth view (H, W, 3) float32 from the host table."""
        flat = self.host_pixels[pic * self.pic_size:(pic + 1) * self.pic_size]
        if self.pixel_dtype == "u8":
            flat = flat.astype(np.float32) * (1.0 / 255.0)
        return flat.reshape(self.height, self.width, 3)
