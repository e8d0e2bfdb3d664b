import numpy as np
import jax.numpy as jnp

from tinynerf.core import rays as raylib


def _pose17(c2w, h, w, f, near, far):
    hwf = np.array([[h], [w], [f]])
    return np.concatenate(
        [np.concatenate([c2w[:3, :4], hwf], axis=1).flatten(), [near, far]]
    ).astype(np.float32)


def test_center_pixel_identity_pose():
    h = w = 8.0
    f = 10.0
    k_inv = raylib.make_k_inv(h, w, f)
    pose = _pose17(np.eye(4), h, w, f, 2.0, 6.0)
    # center pixel: row = 0.5H, col = 0.5W -> camera dir (0, 0, -f) normalized
    origins, dirs, near, far = raylib.pixels_to_rays(
        jnp.array([4.0]), jnp.array([4.0]), jnp.asarray(pose)[None], k_inv)
    np.testing.assert_allclose(np.asarray(origins)[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dirs)[0], [0, 0, -1], atol=1e-6)
    assert float(near[0]) == 2.0 and float(far[0]) == 6.0


def test_q12_transposition_convention():
    # Q12: (row, col) feed (x, y): x_c = row - 0.5W, y_c = -col + 0.5H
    h, w, f = 8.0, 8.0, 10.0
    k_inv = raylib.make_k_inv(h, w, f)
    pose = _pose17(np.eye(4), h, w, f, 1.0, 2.0)
    _, dirs, _, _ = raylib.pixels_to_rays(
        jnp.array([6.0]), jnp.array([4.0]), jnp.asarray(pose)[None], k_inv)
    d = np.asarray(dirs)[0]
    expected = np.array([6.0 - 4.0, -4.0 + 4.0, -f])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(d, expected, atol=1e-6)


def test_dirs_unit_and_rotated():
    rng = np.random.default_rng(0)
    theta = 0.7
    c2w = np.eye(4)
    c2w[:3, :3] = np.array([[np.cos(theta), 0, np.sin(theta)],
                            [0, 1, 0],
                            [-np.sin(theta), 0, np.cos(theta)]])
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    pose = _pose17(c2w, 16, 16, 20.0, 2.0, 6.0)
    rows = jnp.asarray(rng.uniform(0, 16, 5).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 16, 5).astype(np.float32))
    k_inv = raylib.make_k_inv(16, 16, 20.0)
    origins, dirs, _, _ = raylib.pixels_to_rays(
        rows, cols, jnp.broadcast_to(jnp.asarray(pose), (5, 17)), k_inv)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1),
                               1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(origins),
                               np.tile([1, 2, 3], (5, 1)), atol=1e-6)


def test_equivalence_to_reference_homogeneous_matmul():
    """origin + t * (R @ d) must equal the reference's per-point 4x4 form
    c2w @ [t*d, 1] (nerf.py:202-208)."""
    rng = np.random.default_rng(1)
    c2w = np.eye(4)
    c2w[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    c2w[:3, 3] = rng.normal(size=3)
    pose = _pose17(c2w, 16, 16, 20.0, 2.0, 6.0)
    k_inv = raylib.make_k_inv(16, 16, 20.0)
    rows = jnp.array([3.0]); cols = jnp.array([11.0])
    origins, dirs, _, _ = raylib.pixels_to_rays(
        rows, cols, jnp.asarray(pose)[None], k_inv)
    t = 2.5
    ours = np.asarray(origins)[0] + t * np.asarray(dirs)[0]

    # reference formulation
    xy = np.array([3.0, 11.0, 1.0])
    d_cam = xy @ np.asarray(k_inv)
    d_cam = d_cam / np.linalg.norm(d_cam)
    p_cam_h = np.concatenate([t * d_cam, [1.0]])
    ref = (c2w @ p_cam_h)[:3]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ndc_rays_bounds():
    # rays through the frustum should land inside [-1, 1] in x/y and z' -> 1
    h, w, f = 16.0, 16.0, 20.0
    origins = jnp.zeros((3, 3))
    dirs = jnp.asarray(np.array([
        [0.0, 0.0, -1.0],
        [0.2, 0.1, -1.0],
        [-0.3, 0.2, -1.0]], dtype=np.float32))
    o_ndc, d_ndc = raylib.ndc_rays(h, w, f, 1.0, origins, dirs)
    # at t=1 (infinity) z -> 1
    end = np.asarray(o_ndc + d_ndc)
    np.testing.assert_allclose(end[:, 2], 1.0, atol=1e-5)
    start = np.asarray(o_ndc)
    assert np.all(np.abs(start[0, :2]) < 1e-5)  # central ray at origin
