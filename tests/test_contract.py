"""Unbounded-scene stack: mip-360 contraction (CONTRACT) + disparity
sampling (LINDISP). Opt-in capabilities with no reference analog (the
reference marches a fixed [near, far] box, nerf.py:288-295)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf import train as trainlib
from tinynerf.config import Config
from tinynerf.core import render, sampling
from tinynerf.core.contract import contract_mip360, wrap_field_contract
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable


# ---------------------------------------------------------------- contract

def test_contract_identity_inside_unit_ball():
    pts = np.random.default_rng(0).uniform(-0.57, 0.57, (64, 3)).astype(np.float32)
    out = np.asarray(contract_mip360(jnp.asarray(pts)))
    np.testing.assert_allclose(out, pts, atol=1e-6)


def test_contract_bounded_and_radially_monotone():
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = np.array([1.0, 2.0, 10.0, 1e4])
    norms = []
    for r in radii:
        out = np.asarray(contract_mip360(jnp.asarray(r * dirs, jnp.float32)))
        n = np.linalg.norm(out, axis=-1)
        assert np.all(n < 2.0 + 1e-5)
        norms.append(n.mean())
    # contracted radius 2 - 1/r grows with r toward the radius-2 shell
    assert np.all(np.diff(norms) > 0)
    np.testing.assert_allclose(norms[-1], 2.0, atol=1e-3)


def test_contract_continuous_at_boundary():
    d = np.array([[0.6, -0.64, 0.48]], dtype=np.float32)
    d /= np.linalg.norm(d)
    lo = contract_mip360(jnp.asarray(d * (1 - 1e-4)))
    hi = contract_mip360(jnp.asarray(d * (1 + 1e-4)))
    np.testing.assert_allclose(np.asarray(lo), np.asarray(hi), atol=1e-3)


def test_contract_gradient_finite_everywhere():
    f = lambda p: jnp.sum(contract_mip360(p) ** 2)
    for p in ([0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [3.0, -4.0, 12.0]):
        g = jax.grad(f)(jnp.asarray(p, jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))


def test_wrap_field_contract_drops_fast_paths():
    def base(params, points, dirs):
        return points, jnp.sum(points, axis=-1, keepdims=True)

    base.eval_rays = lambda *a: None
    wrapped = wrap_field_contract(base)
    assert not hasattr(wrapped, "eval_rays")
    pts = jnp.asarray([[5.0, 0.0, 0.0]])
    out_pts, _ = wrapped(None, pts, pts)
    np.testing.assert_allclose(np.asarray(out_pts), [[1.8, 0.0, 0.0]],
                               atol=1e-6)


# ----------------------------------------------------------------- lindisp

def test_lindisp_coarse_ts_endpoints_and_density():
    near = jnp.asarray([2.0, 1.0])
    far = jnp.asarray([6.0, 100.0])
    ts = np.asarray(sampling.coarse_ts(near, far, 16, lindisp=True))
    np.testing.assert_allclose(ts[:, 0], np.asarray(near), rtol=1e-6)
    np.testing.assert_allclose(ts[:, -1], np.asarray(far), rtol=1e-5)
    assert np.all(np.diff(ts, axis=1) > 0)
    # disparity spacing concentrates samples near the camera: for the
    # 1 -> 100 ray, more than half the budget lands below the t-linear
    # midpoint
    assert np.sum(ts[1] < 50.5) > 8
    # and the DISPARITY values are uniformly spaced
    disp = 1.0 / ts[1]
    np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0], rtol=1e-4)


def test_lindisp_stratified_monotone_in_bounds():
    near = jnp.full((8,), 0.5)
    far = jnp.full((8,), 40.0)
    ts = np.asarray(sampling.coarse_ts(near, far, 24, lindisp=True,
                                       key=jax.random.PRNGKey(3)))
    assert np.all(np.diff(ts, axis=1) >= 0)
    assert np.all(ts >= 0.5 - 1e-6) and np.all(ts <= 40.0 + 1e-4)
    # jitter actually moved the interior samples
    base = np.asarray(sampling.coarse_ts(near, far, 24, lindisp=True))
    assert np.max(np.abs(ts - base)) > 1e-3


def test_resample_per_bin_delta_matches_scalar_on_uniform_bins():
    key = jax.random.PRNGKey(0)
    b, n_c = 4, 12
    near = jnp.full((b,), 2.0)
    far = jnp.full((b,), 6.0)
    t_co = sampling.coarse_ts(near, far, n_c)
    dense = jax.random.uniform(key, (b, n_c)) * 0.1
    scalar = (far - near) / (n_c - 1)
    per_bin = t_co[:, 1:] - t_co[:, :-1]
    a = sampling.resample(t_co, dense, scalar, 16)
    bb = sampling.resample(t_co, dense, per_bin, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-5,
                               atol=1e-5)


def test_lindisp_rejected_under_ndc():
    params = None
    with pytest.raises(ValueError, match="LINDISP"):
        render.render_rays(params, jnp.zeros((4,)), jnp.zeros((4,)),
                           jnp.zeros((4, 17)), jnp.eye(3), 8, 8,
                           ndc_params=(8.0, 8.0, 10.0), lindisp=True)


def test_contract_rejected_under_ndc():
    cfg = Config(contract=True, ndc=True, use_pallas=False)
    with pytest.raises(ValueError, match="CONTRACT"):
        trainlib.make_field_fn(cfg)


# ------------------------------------------------- end-to-end (360 stack)

@pytest.fixture(scope="module")
def table(request):
    scene_dir = request.getfixturevalue("sync_scene_dir")
    return RayTable(load_scene(scene_dir, "sync", "train"))


def _stack_cfg(**kw):
    base = dict(batch_ray=32, n_coarse=8, n_fine=16, learning=5e-4,
                decay_end=1000, total_iter=100, step=50, use_pallas=False,
                contract=True, lindisp=True, proposal=True,
                fine_field="grid", grid_res=16, grid_extent=2.0,
                prop_grid_res=8, dist_loss=1e-3)
    base.update(kw)
    return Config(**base)


def test_train_step_unbounded_stack_decreases_loss(table):
    """CONTRACT + LINDISP + PROPOSAL(grid) + DIST_LOSS trains end-to-end:
    the full unbounded-360 stack in one jitted step."""
    cfg = _stack_cfg()
    k_inv = make_k_inv(table.height, table.width, float(table.focal))
    state = trainlib.init_state(cfg)
    step = trainlib.make_train_step(cfg, table, k_inv)
    losses = []
    for _ in range(40):
        state, metrics = step(state)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_train_step_contract_mlp_field(table):
    """CONTRACT also wraps the reference MLP family (point-interface path)."""
    cfg = _stack_cfg(fine_field="mlp", proposal=False, lindisp=False,
                     dist_loss=0.0)
    k_inv = make_k_inv(table.height, table.width, float(table.focal))
    state = trainlib.init_state(cfg)
    step = trainlib.make_train_step(cfg, table, k_inv)
    for _ in range(3):
        state, metrics = step(state)
    assert np.isfinite(float(metrics["loss"]))


def test_frame_render_unbounded_stack(table):
    from tinynerf import eval as evallib
    cfg = _stack_cfg(dist_loss=0.0, render_chunk=64)
    k_inv = make_k_inv(table.height, table.width, float(table.focal))
    state = trainlib.init_state(cfg)
    frame_fn = evallib.make_frame_fn(cfg, k_inv, table.height, table.width)
    frame = np.asarray(frame_fn(state.params,
                                jnp.asarray(np.asarray(table.poses)[0])))
    assert frame.shape == (table.height, table.width, 3)
    assert np.all(np.isfinite(frame))


# ---------------------------------------------------------------------------
# Outward-facing 360 capture end-to-end (VERDICT r3 #2): scene generator +
# NEAR/FAR overrides + the full CONTRACT+LINDISP hybrid stack through the
# Runner. TPU quality evidence lives in VALIDATION.md (u360 vs ablations);
# this locks the mechanism on CPU.
# ---------------------------------------------------------------------------

def test_outward_360_scene_trains(tmp_path):
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from make_synthetic_scene import make_360_scene
    finally:
        sys.path.pop(0)
    from tinynerf.config import Config
    from tinynerf.runner import Runner

    scene = str(tmp_path / "s360")
    make_360_scene(scene, hw=16, views=3, val_views=2, test_views=2)
    cfg = Config(
        img_dir=scene, results_path=str(tmp_path / "res"),
        ckpt_path=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
        total_iter=4, step=2, batch_ray=32, n_coarse=8, n_fine=8,
        use_pallas=False, render_chunk=64, learning=2e-3,
        near=0.1, far=80.0, contract=True, lindisp=True, stratified=True,
        proposal=True, prop_field="grid", prop_grid_res=8,
        prop_grid_comp_density=4, prop_grid_comp_app=4,
        prop_grid_decoder_width=8, prop_grid_hybrid=True,
        fine_field="grid", grid_hybrid=True, grid_res=16,
        grid_comp_density=4, grid_comp_app=4, grid_decoder_width=8,
        grid_extent=2.0)
    runner = Runner(cfg)
    # NEAR/FAR overrides reached every split's pose table (sync ingest
    # hardcodes 2.0/6.0)
    for table in (runner.train_table, runner.val_table, runner.test_table):
        pb = np.asarray(table.poses)
        assert float(pb[:, 15].max()) == pytest.approx(0.1)
        assert float(pb[:, 16].min()) == pytest.approx(80.0)
    runner.train("train")
    psnr = runner.display(max_views=1)
    assert np.isfinite(psnr) and psnr > 0.0
