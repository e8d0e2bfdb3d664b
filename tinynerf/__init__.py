"""tinynerf — a TPU-native NeRF training/rendering framework (JAX/XLA/Pallas/pjit).

A ground-up rebuild of the capabilities of the reference PyTorch implementation
(D-Hank/NeRF-tiny, see SURVEY.md): Blender/LLFF ingest, positional-encoded
skip-MLP radiance field, hierarchical (coarse uniform + inverse-CDF fine)
sampling, transmittance compositing, Adam + exponential-decay training with
checkpoint/resume, and full-frame rendering — redesigned TPU-first:

- functional core: pure functions over parameter pytrees, explicit PRNG keys
- one jitted train step; the hierarchical resampler runs fully on device
  (the reference does a host round-trip every iteration, nerf.py:240-246)
- ray-data-parallelism over a `jax.sharding.Mesh` (psum gradients over ICI)
- Pallas TPU kernels for the fused encode->MLP->composite hot path
"""

__version__ = "0.1.0"

from tinynerf.config import Config, load_config  # noqa: F401
