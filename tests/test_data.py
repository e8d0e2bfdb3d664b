import os

import numpy as np
import jax
import jax.numpy as jnp

from tinynerf.data import poses as poseslib
from tinynerf.data.rays import RayTable


def test_blender_ingest(sync_scene_dir):
    scene = poseslib.load_scene(sync_scene_dir, "sync", "train")
    assert scene.poses_bounds.shape == (3, 17)
    assert scene.images.shape == (3, 12, 12, 3)
    # hwf column at flat indices 4, 9, 14 (loader.py:33)
    assert scene.poses_bounds[0, 4] == 12
    assert scene.poses_bounds[0, 9] == 12
    expected_focal = 0.5 * 12 / np.tan(0.4)
    np.testing.assert_allclose(scene.poses_bounds[0, 14], expected_focal,
                               rtol=1e-5)
    # near/far constants (loader.py:9-10)
    np.testing.assert_allclose(scene.poses_bounds[:, 15], 2.0)
    np.testing.assert_allclose(scene.poses_bounds[:, 16], 6.0)
    # pose cache written with the reference's filename
    assert os.path.isfile(os.path.join(sync_scene_dir, "train.npy"))


def test_white_background_compositing(sync_scene_dir):
    # fixture images have alpha=128 in the top half -> compositing onto white
    # must brighten those pixels relative to the raw colors
    scene = poseslib.load_scene(sync_scene_dir, "sync", "train")
    top = scene.images[0, : 12 // 2].mean()
    bottom = scene.images[0, 12 // 2:].mean()
    assert top > bottom - 0.05  # top half mixed with white


def test_llff_ingest_and_axis_shuffle(llff_scene_dir):
    scene = poseslib.load_scene(llff_scene_dir, "llff", "train")
    assert scene.poses_bounds.shape == (3, 17)
    assert scene.images.shape == (3, 8, 10, 3)
    # fixture stored [-up, right, back]; converter must recover [right, up, back]
    from tests.util import _look_at_pose
    want = _look_at_pose(0.0)[:3, :3]
    got = scene.poses_bounds[0, :15].reshape(3, 5)[:, :3]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # per-image near/far preserved from poses_bounds.npy
    np.testing.assert_allclose(scene.poses_bounds[:, 15], 1.0)
    np.testing.assert_allclose(scene.poses_bounds[:, 16], 8.0)


def test_low_res_downsampling(sync_scene_dir):
    scene = poseslib.load_scene(sync_scene_dir, "sync", "train", low_res=2)
    assert scene.images.shape == (3, 6, 6, 3)
    assert scene.height == 6 and scene.width == 6
    full = poseslib.load_scene(sync_scene_dir, "sync", "train")
    np.testing.assert_allclose(scene.focal, full.focal / 2, rtol=1e-5)


def test_recenter_and_rescale():
    from tinynerf.data.poses import recenter_and_rescale
    from tests.test_paths import _forward_facing_rows
    rows = _forward_facing_rows(6)
    out = recenter_and_rescale(rows, bd_factor=0.75)
    c2ws = out[:, :15].reshape(-1, 3, 5)
    # cameras now cluster around the origin looking down -z (back ~ +z)
    centers = c2ws[:, :, 3]
    assert np.linalg.norm(centers.mean(axis=0)) < 0.5
    np.testing.assert_allclose(c2ws[:, :, 2].mean(axis=0), [0, 0, 1],
                               atol=0.15)
    # nearest bound scaled to 1/bd_factor
    np.testing.assert_allclose(out[:, 15].min(), 1.0 / 0.75, rtol=1e-5)
    # rotations stay orthonormal; hwf column untouched
    rots = c2ws[:, :, :3]
    eye = np.einsum("nij,nik->njk", rots, rots)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(c2ws[:, :, 4], rows[:, :15].reshape(-1, 3, 5)[:, :, 4],
                               rtol=1e-6)


def test_file_sort_is_numeric(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in (0, 2, 10, 1):
        (d / f"r_{i}.png").touch()
    files = poseslib.sorted_image_files(str(d))
    nums = [int(f.split("_")[-1].split(".")[0]) for f in files]
    assert nums == [0, 1, 2, 10]


def test_ray_table_flattening_order(sync_scene_dir):
    scene = poseslib.load_scene(sync_scene_dir, "sync", "train")
    table = RayTable(scene)
    assert table.num_pix == 3 * 12 * 12
    # idx = pic*H*W + row*W + col (loader.py:86-88,119-133)
    pic, row, col = 1, 3, 7
    idx = jnp.array([pic * 144 + row * 12 + col])
    batch = table.gather(idx)
    assert float(batch.rows[0]) == row
    assert float(batch.cols[0]) == col
    assert int(batch.pic[0]) == pic
    np.testing.assert_allclose(np.asarray(batch.rgb[0]),
                               scene.images[pic, row, col], atol=1e-6)
    np.testing.assert_allclose(np.asarray(batch.pose17[0]),
                               scene.poses_bounds[pic], atol=1e-6)


def test_ray_table_sampling_deterministic(sync_scene_dir):
    scene = poseslib.load_scene(sync_scene_dir, "sync", "train")
    table = RayTable(scene)
    b1 = table.sample(jax.random.PRNGKey(0), 16)
    b2 = table.sample(jax.random.PRNGKey(0), 16)
    np.testing.assert_array_equal(np.asarray(b1.rows), np.asarray(b2.rows))
    b3 = table.sample(jax.random.PRNGKey(1), 16)
    assert not np.array_equal(np.asarray(b1.rows), np.asarray(b3.rows))
