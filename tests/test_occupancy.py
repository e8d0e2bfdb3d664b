"""Occupancy-grid empty-space skipping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf import train as trainlib
from tinynerf.config import Config
from tinynerf.core import occupancy, render
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable


def _sphere_field(center=(0.0, 0.0, 0.0), radius=0.5, sigma=5.0):
    """Analytic field: constant density inside a sphere, white color."""
    center = jnp.asarray(center)

    def field(params, points, dirs):
        dist = jnp.linalg.norm(points - center, axis=-1, keepdims=True)
        s = jnp.where(dist < radius, sigma, 0.0)
        color = jnp.ones(points.shape[:-1] + (3,))
        return color, s

    return field


def test_grid_update_marks_sphere():
    grid = occupancy.init_grid(resolution=16, half_extent=1.0)
    grid = occupancy.update_grid(grid, None, _sphere_field(),
                                 jax.random.PRNGKey(0), ema=0.0)
    centers = np.asarray(occupancy.cell_centers(16, grid.half_extent))
    occ = np.asarray(grid.density.reshape(-1) > float(grid.threshold))
    # clearly-inside cells occupied; clearly-outside cells (beyond the
    # 1-cell dilation margin) empty
    assert occ[np.linalg.norm(centers, axis=1) < 0.35].all()
    assert not occ[np.linalg.norm(centers, axis=1) > 0.95].any()


def test_tighten_bounds_hits_and_misses():
    grid = occupancy.init_grid(resolution=16, half_extent=1.0)
    grid = occupancy.update_grid(grid, None, _sphere_field(),
                                 jax.random.PRNGKey(0), ema=0.0)
    # ray through the center from z=+4 looking -z: sphere span t in [3.5, 4.5]
    origins = jnp.array([[0.0, 0.0, 4.0], [0.0, 3.0, 4.0]])
    dirs = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    near = jnp.array([2.0, 2.0])
    far = jnp.array([6.0, 6.0])
    new_near, new_far = occupancy.tighten_bounds(grid, origins, dirs,
                                                 near, far)
    assert 3.1 < float(new_near[0]) <= 3.52
    assert 4.48 <= float(new_far[0]) < 4.9
    # miss ray collapses near the far plane
    assert float(new_near[1]) > 5.9


def test_derive_march_steps_covers_ray_span():
    # probe spacing must stay below the 3-cell dilation margin 6*h/res
    for res, h, span in [(64, 1.5, 4.0), (64, 0.25, 10.0), (128, 1.5, 4.0)]:
        n = occupancy.derive_march_steps(res, h, span)
        assert span / n < 6.0 * h / res
    # blender defaults stay at the measured-cheap 64-probe count
    assert occupancy.derive_march_steps(64, 1.5, 4.0) == 64
    # a small-extent grid on a long ray span forces more probes (the
    # round-2 default max(64, res) would silently skip geometry here)
    assert occupancy.derive_march_steps(64, 0.25, 10.0) > 64


def test_runner_derives_march_steps(tmp_path, sync_scene_dir):
    from tinynerf.runner import Runner
    cfg = Config(img_dir=sync_scene_dir, batch_ray=8, n_coarse=4, n_fine=4,
                 use_pallas=False, occ_grid=True, occ_res=8, occ_extent=0.1,
                 white_bkgd=True, ckpt_path=str(tmp_path / "ck"),
                 results_path=str(tmp_path / "res"),
                 log_dir=str(tmp_path / "runs"))
    runner = Runner(cfg)
    # scene rays span far-near = 4.0; margin 6*0.1/8 = 0.075 -> >= 67 probes
    assert cfg.occ_march_steps is not None
    assert 4.0 / cfg.occ_march_steps < 6.0 * 0.1 / 8


def test_init_grid_is_fully_occupied_until_first_update():
    # inf-initialized density -> tighten is a (near, far) no-op: safe warmup
    grid = occupancy.init_grid(resolution=8, half_extent=1.0)
    origins = jnp.array([[0.0, 0.0, 4.0]])
    dirs = jnp.array([[0.0, 0.0, -1.0]])
    near, far = jnp.array([3.0]), jnp.array([5.0])
    n2, f2 = occupancy.tighten_bounds(grid, origins, dirs, near, far)
    assert float(n2[0]) <= 3.0 + 1e-5 and float(f2[0]) >= 5.0 - 1e-5


def test_render_with_occ_grid_matches_without_when_fully_occupied():
    from tests.test_rays import _pose17
    from tinynerf.core import mlp
    params = mlp.init_network(jax.random.PRNGKey(0))
    k_inv = make_k_inv(8.0, 8.0, 10.0)
    pose = jnp.asarray(np.tile(_pose17(np.eye(4), 8, 8, 10.0, 2.0, 6.0),
                               (4, 1)))
    rows = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    cols = jnp.asarray(np.array([4.0, 3.0, 2.0, 1.0], np.float32))
    grid = occupancy.init_grid(resolution=8, half_extent=10.0)  # inf = all occ
    base = render.render_rays(params, rows, cols, pose, k_inv, 8, 8)
    with_occ = render.render_rays(params, rows, cols, pose, k_inv, 8, 8,
                                  occ_grid=grid)
    np.testing.assert_allclose(np.asarray(with_occ[1]), np.asarray(base[1]),
                               atol=1e-5)


def test_runner_with_occ_and_white_bkgd(sync_scene_dir, tmp_path):
    """Full Runner path (train + display) with the occupancy grid enabled."""
    from tinynerf.runner import Runner
    cfg = Config(
        img_dir=sync_scene_dir, results_path=str(tmp_path / "r"),
        ckpt_path=str(tmp_path / "c"), log_dir=str(tmp_path / "l"),
        total_iter=20, step=10, batch_ray=32, n_coarse=4, n_fine=4,
        use_pallas=False, render_chunk=72,
        occ_grid=True, occ_res=8, occ_extent=6.0, occ_update_every=5,
        white_bkgd=True)
    runner = Runner(cfg)
    runner.train("train")
    assert int(runner.state.iteration) == 20
    assert runner.state.occ is not None
    score = runner.display(max_views=1)
    assert np.isfinite(score)

    # the grid is training state: a resumed Runner must restore it from the
    # checkpoint (a fresh all-occupied grid changes the sample distribution
    # the weights co-adapted to and tanks display PSNR)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, continue_=True)
    runner2 = Runner(cfg2)
    np.testing.assert_array_equal(np.asarray(runner2.state.occ.raw),
                                  np.asarray(runner.state.occ.raw))
    assert np.isfinite(runner2.display(max_views=1))


def test_occ_ini_keys(tmp_path):
    from tinynerf.config import load_config
    path = tmp_path / "s.ini"
    path.write_text("[s]\nOCC_GRID = True\nOCC_RES = 32\nOCC_EXTENT = 2.5\n"
                    "OCC_THRESH = 0.05\nOCC_UPDATE_EVERY = 64\n"
                    "OCC_SUBSET = 0.25\nWHITE_BKGD = True\n")
    cfg = load_config(str(path))
    assert cfg.occ_grid is True and cfg.occ_res == 32
    assert cfg.occ_extent == 2.5 and cfg.occ_thresh == 0.05
    assert cfg.occ_update_every == 64 and cfg.white_bkgd is True
    assert cfg.occ_subset == 0.25


def test_subset_refresh_converges_to_full_sweep():
    """NerfAcc-style partial refresh: probing a random quarter of the cells
    per round converges to the same occupancy map as full sweeps, while
    untouched cells stay conservatively occupied (inf) in the interim."""
    field = _sphere_field()
    grid = occupancy.init_grid(resolution=16, half_extent=1.0)
    key = jax.random.PRNGKey(1)
    n_cells = 16 ** 3
    # after ONE partial refresh: no NaNs, untouched cells still occupied
    key, k = jax.random.split(key)
    g1 = occupancy.update_grid(grid, None, field, k, ema=0.0,
                               subset=n_cells // 4)
    raw1 = np.asarray(g1.raw.reshape(-1))
    assert np.isinf(raw1).any() and not np.isnan(raw1).any()
    assert (np.asarray(g1.density.reshape(-1))[np.isinf(raw1)]
            > float(g1.threshold)).all()

    for _ in range(40):
        key, k = jax.random.split(key)
        grid = occupancy.update_grid(grid, None, field, k, ema=0.0,
                                     subset=n_cells // 4)
    centers = np.asarray(occupancy.cell_centers(16, grid.half_extent))
    occ = np.asarray(grid.density.reshape(-1) > float(grid.threshold))
    r = np.linalg.norm(centers, axis=1)
    assert occ[r < 0.35].all()
    # far-outside cells: empty except the vanishing never-probed tail
    far_out = occ[r > 0.95]
    assert far_out.mean() < 0.01


def test_runner_rejects_occ_without_white_bkgd(sync_scene_dir, tmp_path):
    from tinynerf.runner import Runner
    cfg = Config(
        img_dir=sync_scene_dir, results_path=str(tmp_path / "r"),
        ckpt_path=str(tmp_path / "c"), log_dir=str(tmp_path / "l"),
        batch_ray=32, n_coarse=4, n_fine=4, use_pallas=False,
        occ_grid=True, occ_res=8, white_bkgd=False)
    with pytest.raises(ValueError, match="WHITE_BKGD"):
        Runner(cfg)


def test_host_fed_step_threads_occ_grid(sync_scene_dir):
    """OCC_GRID + HOST_FEED: the grid must refresh and shape the loss (it
    used to be silently dropped on this path)."""
    cfg = Config(batch_ray=16, n_coarse=4, n_fine=4, use_pallas=False,
                 occ_grid=True, occ_res=8, occ_extent=6.0,
                 occ_update_every=2, white_bkgd=True)
    table = RayTable(load_scene(sync_scene_dir, "sync", "train"))
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_host_fed_train_step(cfg, k_inv)
    state = trainlib.init_state(cfg)
    assert state.occ is not None
    for i in range(3):
        batch = table.sample(jax.random.PRNGKey(i), cfg.batch_ray)
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
    # subset refresh: probed cells turn finite in the raw grid; the dilated
    # query grid may legitimately stay all-inf until coverage builds up
    raw = np.asarray(state.occ.raw)
    assert np.isfinite(raw).any() and not np.isnan(raw).any()
    assert not np.isnan(np.asarray(state.occ.density)).any()


def test_train_step_with_occ_grid(sync_scene_dir):
    cfg = Config(batch_ray=16, n_coarse=4, n_fine=4, use_pallas=False,
                 occ_grid=True, occ_res=8, occ_extent=2.0,
                 occ_update_every=2, white_bkgd=True)
    table = RayTable(load_scene(sync_scene_dir, "sync", "train"))
    k_inv = make_k_inv(table.height, table.width, table.focal)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    assert state.occ is not None
    for _ in range(3):
        state, m = step(state)
        assert np.isfinite(float(m["loss"]))
    # the grid was refreshed in-graph (iteration 0 and 2 are refresh steps)
    raw = np.asarray(state.occ.raw)
    assert np.isfinite(raw).any() and not np.isnan(raw).any()
    assert not np.isnan(np.asarray(state.occ.density)).any()
