"""Test harness config: force the CPU backend with 8 fake devices so the
multi-chip sharding paths run without TPU hardware (SURVEY.md §4). Must run
before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# A site hook in this image forces jax_platforms to "axon,cpu" regardless of
# the env var; override through the config API before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sync_scene_dir(tmp_path_factory):
    """A tiny on-disk Blender-style scene (train/val/test splits)."""
    from tests.util import make_sync_scene
    root = tmp_path_factory.mktemp("sync_scene")
    make_sync_scene(str(root), n_pics=3, hw=12)
    return str(root)


@pytest.fixture(scope="session")
def llff_scene_dir(tmp_path_factory):
    """A tiny on-disk LLFF-style scene (poses_bounds.npy + images/)."""
    from tests.util import make_llff_scene
    root = tmp_path_factory.mktemp("llff_scene")
    make_llff_scene(str(root), n_pics=3, height=8, width=10)
    return str(root)
