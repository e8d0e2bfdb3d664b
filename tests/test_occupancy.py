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


# ---------------------------------------------------------------------------
# Contracted occupancy grid (CONTRACT scenes, round 4): cells live in the
# radius-2 contraction ball; probes march in disparity.
# ---------------------------------------------------------------------------

def test_inv_contract_roundtrip():
    from tinynerf.core.contract import contract_mip360, inv_contract_mip360
    pts = jnp.asarray(np.random.default_rng(0).uniform(-40, 40, (256, 3)),
                      jnp.float32)
    c = contract_mip360(pts)
    assert float(jnp.max(jnp.linalg.norm(c, axis=-1))) < 2.0
    back = inv_contract_mip360(c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                               rtol=2e-3, atol=1e-3)
    # inside the unit ball both maps are the identity
    inner = jnp.asarray([[0.3, -0.2, 0.1]])
    np.testing.assert_allclose(np.asarray(inv_contract_mip360(inner)),
                               np.asarray(inner), rtol=1e-6)
    # at/past the boundary the inverse clamps to a finite radius
    edge = inv_contract_mip360(jnp.asarray([[2.0, 0.0, 0.0]]))
    assert np.isfinite(np.asarray(edge)).all()


def _wrap_world_field(world_field):
    """Production shape: the inner field is parameterized in CONTRACTED
    coordinates (a GRID_EXTENT=2 grid), and wrap_field_contract turns it
    into a world-coordinate field. For an analytic WORLD-space field, the
    contracted-coordinate inner field is world(inv(c))."""
    from tinynerf.core.contract import (inv_contract_mip360,
                                        wrap_field_contract)

    def inner(params, pts_c, dirs):
        return world_field(params, inv_contract_mip360(pts_c), dirs)

    return wrap_field_contract(inner)


def test_contracted_update_marks_far_sphere():
    """A sphere at world r=5 (outside any bounded extent) must mark the
    contracted cells around contract(5*e_x) (|c| = 2 - 1/5 = 1.8) when the
    grid refreshes through the CONTRACTING field wrapper. Radius 2 so its
    contracted image (~2*2/25 = 0.16 thick) spans at least one res-32
    cell (0.125) — content much smaller than its squared distance is
    sub-cell in contracted space, the documented thin-content caveat."""
    from tinynerf.core.contract import contract_mip360
    world_field = _sphere_field(center=(5.0, 0.0, 0.0), radius=2.0)
    wrapped = _wrap_world_field(world_field)

    grid = occupancy.init_grid(resolution=32, half_extent=2.0)
    grid = occupancy.update_grid(grid, None, wrapped, jax.random.PRNGKey(1),
                                 ema=0.0, contract=True)
    occ = np.asarray(grid.density > float(grid.threshold))
    centers = np.asarray(occupancy.cell_centers(32, grid.half_extent))
    occ_flat = occ.reshape(-1)
    c_target = np.asarray(contract_mip360(jnp.asarray([[5.0, 0.0, 0.0]])))[0]
    near_target = np.linalg.norm(centers - c_target, axis=1) < 0.15
    assert occ_flat[near_target].any()
    # contracted cells far from the sphere's image stay empty (e.g. the
    # opposite direction)
    opposite = np.linalg.norm(centers - (-c_target), axis=1) < 0.3
    assert not occ_flat[opposite].any()


def test_contracted_tighten_never_excludes_surface():
    """The tightened [near, far] must contain every analytic sphere
    intersection, for rays from an origin ring through a scene spanning
    two depth octaves — the empirical soundness check backing
    derive_march_steps_contracted's tangential-motion caveat."""
    rng = np.random.default_rng(7)
    # every sphere's contracted thickness (~2*radius/r^2) spans >= 1
    # res-32 cell — the regime the grid is sound for (thin-at-distance
    # content relies on jittered-probe EMA + dilation, tested in training)
    spheres = [((5.0, 0.0, 0.0), 2.0), ((-2.5, 0.5, 0.0), 0.8),
               ((0.0, 0.0, -6.0), 2.5), ((12.0, 2.0, 12.0), 10.0)]

    def world_field(params, points, dirs):
        s = jnp.zeros(points.shape[:-1] + (1,))
        for c, r in spheres:
            dist = jnp.linalg.norm(points - jnp.asarray(c), axis=-1,
                                   keepdims=True)
            s = jnp.maximum(s, jnp.where(dist < r, 5.0, 0.0))
        return jnp.ones(points.shape[:-1] + (3,)), s

    wrapped = _wrap_world_field(world_field)
    grid = occupancy.init_grid(resolution=32, half_extent=2.0)
    for i in range(8):  # repeated jittered sweeps (hits persist via EMA)
        grid = occupancy.update_grid(grid, None, wrapped,
                                     jax.random.PRNGKey(i), ema=0.5,
                                     contract=True)

    n = 512
    origins = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    near = jnp.full((n,), 1.0)
    far = jnp.full((n,), 80.0)
    n_steps = occupancy.derive_march_steps_contracted(32, 1.0, 80.0)
    nn, nf = occupancy.tighten_bounds(grid, origins, dirs, near, far,
                                      n_steps=n_steps, contract=True,
                                      lindisp=True)
    nn, nf = np.asarray(nn), np.asarray(nf)
    # analytic first/last intersections per ray
    o = np.asarray(origins)
    for ci, r in spheres:
        oc = o - np.asarray(ci)
        b = np.sum(oc * d, axis=1)
        disc = b * b - (np.sum(oc * oc, axis=1) - r * r)
        hit = disc > 0
        t0 = -b - np.sqrt(np.maximum(disc, 0))
        t1 = -b + np.sqrt(np.maximum(disc, 0))
        valid = hit & (t0 > 1.0) & (t0 < 80.0)
        assert (nn[valid] <= t0[valid] + 1e-3).all(), "entry excluded"
        assert (nf[valid] >= np.minimum(t1[valid], 80.0) - 1e-3).all(), \
            "exit excluded"
    # and it actually TIGHTENS: rays pointing at empty sky collapse
    assert (nf - nn < 79.0).any()


def test_runner_360_with_contracted_occ(tmp_path):
    """End-to-end: the u360 stack + OCC_GRID trains and renders through the
    Runner (guards: lindisp required, extent forced to 2)."""
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from make_synthetic_scene import make_360_scene
    finally:
        sys.path.pop(0)
    from tinynerf.runner import Runner

    scene = str(tmp_path / "s360occ")
    make_360_scene(scene, hw=16, views=3, val_views=2, test_views=2)
    kw = dict(
        img_dir=scene, results_path=str(tmp_path / "res"),
        ckpt_path=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
        total_iter=4, step=2, batch_ray=32, n_coarse=8, n_fine=8,
        use_pallas=False, render_chunk=64, learning=2e-3,
        near=1.0, far=80.0, contract=True, lindisp=True,
        proposal=True, prop_field="grid", prop_grid_res=8,
        prop_grid_comp_density=4, prop_grid_comp_app=4,
        prop_grid_decoder_width=8,
        fine_field="grid", grid_res=16, grid_comp_density=4,
        grid_comp_app=4, grid_decoder_width=8, grid_extent=2.0,
        occ_grid=True, occ_res=16, occ_extent=1.5,  # 1.5 -> forced to 2
        occ_update_every=2, occ_subset=1.0, white_bkgd=True)
    with pytest.raises(ValueError, match="requires LINDISP"):
        Runner(Config(**{**kw, "lindisp": False}))
    runner = Runner(Config(**kw))
    assert float(runner.cfg.occ_extent) == 2.0
    assert runner.cfg.occ_march_steps >= 64
    runner.train("train")
    assert np.isfinite(np.asarray(runner.state.occ.raw)).any()
    psnr = runner.display(max_views=1)
    assert np.isfinite(psnr)


def test_march_res_onehot_matches_gather_at_full_res():
    """OCC_MARCH_RES == OCC_RES: the one-hot equality matmul is the exact
    same lookup as the gather, so the tightened bounds are identical."""
    grid = occupancy.init_grid(resolution=16, half_extent=1.0)
    grid = occupancy.update_grid(grid, None, _sphere_field(),
                                 jax.random.PRNGKey(0), ema=0.0)
    rng = np.random.default_rng(11)
    n = 64
    origins = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 3))
                          + np.array([0, 0, 4.0]), jnp.float32)
    d = -rng.normal(0, 0.1, (n, 3)) + np.array([0, 0, -1.0])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    near, far = jnp.full((n,), 2.0), jnp.full((n,), 6.0)
    n0, f0 = occupancy.tighten_bounds(grid, origins, dirs, near, far)
    n1, f1 = occupancy.tighten_bounds(grid, origins, dirs, near, far,
                                      march_res=16)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_march_res_pooled_is_conservative_and_tightens():
    """Pooled march (M < R): every pooled bound CONTAINS the full-res bound
    (max-pooled occupancy is a superset), misses still collapse, and the
    hit rays still tighten meaningfully."""
    grid = occupancy.init_grid(resolution=32, half_extent=1.0)
    for i in range(4):
        grid = occupancy.update_grid(grid, None, _sphere_field(),
                                     jax.random.PRNGKey(i), ema=0.5)
    rng = np.random.default_rng(5)
    n = 128
    origins = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3))
                          + np.array([0, 0, 4.0]), jnp.float32)
    d = rng.normal(0, 0.15, (n, 3)) + np.array([0, 0, -1.0])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    near, far = jnp.full((n,), 2.0), jnp.full((n,), 6.0)
    n_full, f_full = occupancy.tighten_bounds(grid, origins, dirs, near, far)
    for m in (16, 8):
        n_p, f_p = occupancy.tighten_bounds(grid, origins, dirs, near, far,
                                            march_res=m)
        hit_full = np.asarray(f_full - n_full) > 1e-2
        hit_p = np.asarray(f_p - n_p) > 1e-2
        # superset: every full-res hit is a pooled hit, with wider bounds
        assert (hit_p | ~hit_full).all()
        both = hit_full & hit_p
        assert (np.asarray(n_p)[both] <= np.asarray(n_full)[both] + 1e-5).all()
        assert (np.asarray(f_p)[both] >= np.asarray(f_full)[both] - 1e-5).all()
        # still tightens: center rays don't keep the whole [2, 6] span
        assert (np.asarray(f_p - n_p)[both] < 3.9).any()
    with pytest.raises(ValueError):
        occupancy.tighten_bounds(grid, origins, dirs, near, far, march_res=10)


def test_contracted_pooled_march_never_excludes_surface():
    """The pooled one-hot march under CONTRACT+LINDISP keeps the
    never-excludes-surface guarantee (probe counts derived for the FINE
    grid stay valid: pooling only grows occupied regions)."""
    spheres = [((5.0, 0.0, 0.0), 2.0), ((-2.5, 0.5, 0.0), 0.8),
               ((0.0, 0.0, -6.0), 2.5), ((12.0, 2.0, 12.0), 10.0)]

    def world_field(params, points, dirs):
        s = jnp.zeros(points.shape[:-1] + (1,))
        for c, r in spheres:
            dist = jnp.linalg.norm(points - jnp.asarray(c), axis=-1,
                                   keepdims=True)
            s = jnp.maximum(s, jnp.where(dist < r, 5.0, 0.0))
        return jnp.ones(points.shape[:-1] + (3,)), s

    wrapped = _wrap_world_field(world_field)
    grid = occupancy.init_grid(resolution=32, half_extent=2.0)
    for i in range(8):
        grid = occupancy.update_grid(grid, None, wrapped,
                                     jax.random.PRNGKey(i), ema=0.5,
                                     contract=True)
    rng = np.random.default_rng(7)
    n = 256
    origins = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    near, far = jnp.full((n,), 1.0), jnp.full((n,), 80.0)
    n_steps = occupancy.derive_march_steps_contracted(32, 1.0, 80.0)
    nn, nf = occupancy.tighten_bounds(grid, origins, dirs, near, far,
                                      n_steps=n_steps, contract=True,
                                      lindisp=True, march_res=16)
    nn, nf = np.asarray(nn), np.asarray(nf)
    o = np.asarray(origins)
    for ci, r in spheres:
        oc = o - np.asarray(ci)
        b = np.sum(oc * d, axis=1)
        disc = b * b - (np.sum(oc * oc, axis=1) - r * r)
        hit = disc > 0
        t0 = -b - np.sqrt(np.maximum(disc, 0))
        t1 = -b + np.sqrt(np.maximum(disc, 0))
        valid = hit & (t0 > 1.0) & (t0 < 80.0)
        assert (nn[valid] <= t0[valid] + 1e-3).all(), "entry excluded"
        assert (nf[valid] >= np.minimum(t1[valid], 80.0) - 1e-3).all(), \
            "exit excluded"
    assert (nf - nn < 79.0).any()
