"""Native C++ raystore + host-feed + uint8 pixel-table paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf import train as trainlib
from tinynerf.config import Config
from tinynerf.core.rays import make_k_inv
from tinynerf.data.native import HostRayStore, NumpyRayStore, make_ray_store
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayBatch, RayTable


@pytest.fixture(scope="module")
def pix_poses():
    rng = np.random.default_rng(0)
    pixels = rng.uniform(0, 1, (4 * 8 * 8, 3)).astype(np.float32)
    poses = rng.normal(size=(4, 17)).astype(np.float32)
    return pixels, poses


def test_native_builds():
    assert HostRayStore.available(), "C++ toolchain should build raystore"


def test_native_deterministic_and_correct(pix_poses):
    pixels, poses = pix_poses
    s = HostRayStore(pixels, poses, 8, 8, seed=624)
    try:
        r1 = s.sample(5, 32)
        r2 = s.sample(5, 32)
        for a, b in zip(r1, r2):
            np.testing.assert_array_equal(a, b)
        rows, cols, rgb, pose, pic = r1
        idx = pic * 64 + rows.astype(int) * 8 + cols.astype(int)
        np.testing.assert_allclose(rgb, pixels[idx], atol=1e-6)
        np.testing.assert_allclose(pose, poses[pic], atol=1e-6)
        assert 0 <= rows.min() and rows.max() < 8
    finally:
        s.close()


def test_native_prefetch_matches_sync(pix_poses):
    pixels, poses = pix_poses
    s = HostRayStore(pixels, poses, 8, 8, seed=1)
    try:
        s.start(16, depth=3)
        fetched = [s.next() for _ in range(5)]
        for i, batch in enumerate(fetched):
            direct = s.sample(i, 16)
            for a, b in zip(batch, direct):
                np.testing.assert_array_equal(a, b)
    finally:
        s.close()


def test_native_u8_dequantizes(pix_poses):
    pixels, poses = pix_poses
    u8 = (pixels * 255).astype(np.uint8)
    s = HostRayStore(u8, poses, 8, 8, seed=2)
    try:
        _, _, rgb, _, pic = s.sample(0, 64)
        assert rgb.dtype == np.float32
        assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    finally:
        s.close()


def test_numpy_fallback_same_api(pix_poses):
    pixels, poses = pix_poses
    s = NumpyRayStore(pixels, poses, 8, 8, seed=3)
    s.start(8)
    rows, cols, rgb, pose, pic = s.next()
    assert rows.shape == (8,) and rgb.shape == (8, 3) and pose.shape == (8, 17)
    s.close()


def test_u8_ray_table(sync_scene_dir):
    scene = load_scene(sync_scene_dir, "sync", "train")
    t32 = RayTable(scene)
    t8 = RayTable(scene, pixel_dtype="u8")
    b32 = t32.sample(jax.random.PRNGKey(0), 64)
    b8 = t8.sample(jax.random.PRNGKey(0), 64)
    assert b8.rgb.dtype == jnp.float32
    # quantization error bounded by half a step
    np.testing.assert_allclose(np.asarray(b8.rgb), np.asarray(b32.rgb),
                               atol=0.5 / 255 + 1e-6)
    np.testing.assert_allclose(t8.image(0), t32.image(0), atol=0.5 / 255 + 1e-6)


@pytest.mark.parametrize("proposal", [False, True])
def test_host_fed_train_step(sync_scene_dir, proposal):
    cfg = Config(batch_ray=32, n_coarse=8, n_fine=8, use_pallas=False,
                 host_feed=True, proposal=proposal)
    scene = load_scene(sync_scene_dir, "sync", "train")
    table = RayTable(scene, device_pixels=False)
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_host_fed_train_step(cfg, k_inv)
    state = trainlib.init_state(cfg)
    store = make_ray_store(table.host_pixels, np.asarray(table.poses),
                           table.height, table.width, seed=0)
    store.start(cfg.batch_ray)
    try:
        losses = []
        for _ in range(3):
            rows, cols, rgb, pose, pic = store.next()
            batch = RayBatch(rows=jnp.asarray(rows), cols=jnp.asarray(cols),
                             rgb=jnp.asarray(rgb), pose17=jnp.asarray(pose),
                             pic=jnp.asarray(pic))
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert int(state.iteration) == 3
    finally:
        store.close()
