"""Camera-path generation + NDC render path + path video rendering."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinynerf import eval as evallib, train as trainlib
from tinynerf.config import Config
from tinynerf.core import render
from tinynerf.core.rays import make_k_inv, pixels_to_rays
from tinynerf.data import paths
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable


@pytest.fixture(scope="module")
def pose_rows(request):
    scene = load_scene(request.getfixturevalue("sync_scene_dir"),
                       "sync", "train")
    return scene.poses_bounds


def _check_rows(rows, n):
    assert rows.shape == (n, 17)
    c2ws = rows[:, :15].reshape(-1, 3, 5)[:, :, :4]
    rots = c2ws[:, :, :3]
    # rotation columns orthonormal
    eye = np.einsum("nij,nik->njk", rots, rots)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (n, 1, 1)), atol=1e-5)
    assert np.all(rows[:, 15] < rows[:, 16])  # near < far


def test_orbit_path(pose_rows):
    rows = paths.orbit_path(pose_rows, n_views=16)
    _check_rows(rows, 16)
    # orbit keeps constant radius
    c2ws = rows[:, :15].reshape(-1, 3, 5)[:, :, :4]
    radii = np.linalg.norm(c2ws[:, :, 3], axis=1)
    np.testing.assert_allclose(radii, radii[0], rtol=1e-5)
    # cameras look at the origin: back axis parallel to position
    backs = c2ws[:, :, 2]
    cos = np.sum(backs * c2ws[:, :, 3], axis=1) / radii
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def _forward_facing_rows(n=5):
    """Cluster of near-parallel cameras (LLFF-style forward-facing rig)."""
    rng = np.random.default_rng(0)
    rows = np.zeros((n, 17), np.float32)
    hwf = np.array([8.0, 10.0, 25.0])
    for i in range(n):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.2 * rng.normal(), 0.1 * rng.normal(),
                      4.0 + 0.1 * rng.normal()]
        rows[i] = np.concatenate(
            [np.concatenate([c2w[:3, :4], hwf.reshape(3, 1)], axis=1)
             .flatten(), [1.0, 8.0]])
    return rows


def test_spiral_path():
    base = _forward_facing_rows()
    rows = paths.spiral_path(base, n_views=12, res_scale=2.0)
    _check_rows(rows, 12)
    hwf = rows[0, :15].reshape(3, 5)[:, 4]
    base_hwf = base[0, :15].reshape(3, 5)[:, 4]
    np.testing.assert_allclose(hwf, base_hwf * 2.0, rtol=1e-5)


def test_spiral_path_360_capture_does_not_degenerate(pose_rows):
    # spiral on an inward 360 rig is unusual but must stay well-formed
    rows = paths.spiral_path(pose_rows, n_views=6)
    _check_rows(rows, 6)


def test_make_path_dispatch(pose_rows):
    assert paths.make_path(pose_rows, "llff", 4).shape == (4, 17)
    assert paths.make_path(pose_rows, "sync", 4).shape == (4, 17)


def test_ndc_render_runs(pose_rows):
    from tinynerf.core import mlp
    import jax
    params = mlp.init_network(jax.random.PRNGKey(0))
    k_inv = make_k_inv(12, 12, 10.0)
    rows = jnp.asarray(np.array([3.0, 4.0], np.float32))
    cols = jnp.asarray(np.array([5.0, 6.0], np.float32))
    pose17 = jnp.asarray(np.tile(pose_rows[0], (2, 1)))
    c_co, c_fi = render.render_rays(params, rows, cols, pose17, k_inv,
                                    4, 4, ndc_params=(12.0, 12.0, 10.0))
    assert np.all(np.isfinite(np.asarray(c_fi)))


def test_render_path_video(sync_scene_dir, tmp_path, pose_rows):
    import jax
    cfg = Config(batch_ray=16, n_coarse=4, n_fine=4, use_pallas=False,
                 render_chunk=72, results_path=str(tmp_path))
    state = trainlib.init_state(cfg)
    rows = paths.orbit_path(pose_rows, n_views=2)
    hwf = rows[0, :15].reshape(3, 5)[:, 4]
    k_inv = make_k_inv(float(hwf[0]), float(hwf[1]), float(hwf[2]))
    frames = evallib.render_path(cfg, state.params, rows, k_inv,
                                 str(tmp_path / "path"), save=True)
    assert frames.shape == (2, 12, 12, 3)
    import os
    assert (os.path.isfile(tmp_path / "path.mp4")
            or os.path.isfile(tmp_path / "path.gif"))


def test_render_path_matches_display_with_occ_grid(sync_scene_dir, tmp_path):
    """An occ-trained checkpoint's path render must sample the SAME
    tightened intervals as its own test renders (round-2 gap: render_path
    dropped the occ grid, changing output statistics)."""
    from tinynerf.core import occupancy

    cfg = Config(batch_ray=16, n_coarse=4, n_fine=4, use_pallas=False,
                 render_chunk=72, results_path=str(tmp_path),
                 occ_grid=True, occ_res=8, occ_extent=2.0, white_bkgd=True)
    table = RayTable(load_scene(sync_scene_dir, "sync", "test"))
    k_inv = make_k_inv(table.height, table.width, table.focal)
    state = trainlib.init_state(cfg)
    # a grid with real structure: occupied center, empty shell
    grid = occupancy.init_grid(cfg.occ_res, cfg.occ_extent, cfg.occ_thresh)
    raw = np.zeros((cfg.occ_res,) * 3, np.float32)
    raw[3:5, 3:5, 3:5] = 1.0
    grid = grid._replace(raw=jnp.asarray(raw),
                         density=occupancy._dilate(jnp.asarray(raw)))

    disp = evallib.render_test_set(cfg, state.params, table, k_inv, "t", 0,
                                   save=False, max_views=1, occ_grid=grid)
    path = evallib.render_path(cfg, state.params,
                               np.asarray(table.poses)[:1], k_inv,
                               str(tmp_path / "p"), save=False,
                               occ_grid=grid)
    np.testing.assert_allclose(path[0], disp[0], atol=1e-5)
    # and WITHOUT the grid the render differs (the grid has a real effect,
    # so the equality above is not vacuous)
    path_nogrid = evallib.render_path(cfg, state.params,
                                      np.asarray(table.poses)[:1], k_inv,
                                      str(tmp_path / "p2"), save=False)
    assert float(np.abs(path_nogrid[0] - disp[0]).max()) > 1e-4


def test_sharded_path_render_matches_unsharded(sync_scene_dir, tmp_path,
                                               pose_rows):
    """BASELINE stretch config 5: res_scale=2 spiral/orbit path rendered
    through the mesh-sharded frame path — tiles must assemble to the
    unsharded result."""
    import jax
    from tinynerf.parallel import mesh as meshlib

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    cfg = Config(batch_ray=16, n_coarse=4, n_fine=4, use_pallas=False,
                 render_chunk=64, results_path=str(tmp_path))
    state = trainlib.init_state(cfg)
    rows = paths.make_path(pose_rows, "sync", n_views=2, res_scale=2.0)
    hwf = rows[0, :15].reshape(3, 5)[:, 4]
    assert int(hwf[0]) == 2 * 12  # res_scale doubled the frame
    k_inv = make_k_inv(float(hwf[0]), float(hwf[1]), float(hwf[2]))
    mesh = meshlib.make_mesh(8)
    sharded = evallib.render_path(
        cfg, state.params, rows, k_inv, str(tmp_path / "sp"), save=False,
        batch_sharding=meshlib.batch_sharding(mesh))
    plain = evallib.render_path(cfg, state.params, rows, k_inv,
                                str(tmp_path / "up"), save=False)
    assert sharded.shape == (2, 24, 24, 3)
    # partitioned reductions reassociate fp: observed max |delta| ~3e-5
    np.testing.assert_allclose(sharded, plain, atol=1e-4)


# ---------------------------------------------------------------------------
# Outward-facing (unbounded-360) rig paths — round 4
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pose_rows_360(tmp_path_factory):
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from make_synthetic_scene import make_360_scene
    finally:
        sys.path.pop(0)
    root = str(tmp_path_factory.mktemp("s360_paths"))
    make_360_scene(root, hw=12, views=6, val_views=2, test_views=2)
    return load_scene(root, "sync", "train").poses_bounds


def test_is_outward_rig(pose_rows, pose_rows_360):
    assert not paths.is_outward_rig(pose_rows)       # inward orbit capture
    assert paths.is_outward_rig(pose_rows_360)       # outward ring capture


def test_pan_path_and_dispatch(pose_rows_360):
    rows = paths.pan_path(pose_rows_360, n_views=12)
    _check_rows(rows, 12)
    c2ws = rows[:, :15].reshape(-1, 3, 5)[:, :, :4]
    centers = c2ws[:, :, 3]
    # cameras stay ON the small ring...
    radii = np.linalg.norm(centers, axis=1)
    np.testing.assert_allclose(radii, radii[0], rtol=1e-6)
    assert radii[0] < 1.0
    # ...and look OUTWARD (back axis anti-aligned with position direction)
    ok = radii > 1e-6
    align = np.sum(c2ws[ok, :, 2] * (centers[ok] / radii[ok, None]), axis=1)
    assert (align < -0.3).all()
    # make_path auto-selects the pan for outward rigs
    auto = paths.make_path(pose_rows_360, "sync", n_views=12)
    np.testing.assert_allclose(auto, rows)
    # near/far carried from the capture (NEAR/FAR overrides ride the rows)
    assert np.all(rows[:, 15] < rows[:, 16])


def test_free_pose_dispatch(pose_rows, pose_rows_360):
    inward = paths.free_pose(pose_rows, 45.0, elev_deg=-20.0)
    np.testing.assert_allclose(
        inward, paths.orbit_pose(pose_rows, 45.0, elev_deg=-20.0))
    out = paths.free_pose(pose_rows_360, 90.0, elev_deg=10.0)
    _check_rows(out[None], 1)
    c2w = out[:15].reshape(3, 5)[:, :4]
    # look direction tilts up by ~10 degrees, position stays on the ring
    look = -c2w[:, 2]
    np.testing.assert_allclose(np.rad2deg(np.arcsin(look[1])), 10.0,
                               atol=0.5)
    assert np.linalg.norm(c2w[:, 3]) < 1.0
