"""Coarse-to-fine grid upsampling (GRID_UPSAMPLE): the interpolation
operator, train-state resize, schedule parsing, and Runner milestone
handling including exact resume across a milestone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf.config import Config, parse_grid_upsample
from tinynerf.core import gridfield
from tinynerf.runner import Runner
from tinynerf import train as trainlib


def test_upsample_matrix_partition_of_unity():
    w = np.asarray(gridfield.upsample_matrix(9, 23))
    assert w.shape == (23, 9)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    assert (w >= 0).all()


def test_upsample_preserves_field_when_nodes_contained():
    """new_res = 2R-1 keeps every old node on the new lattice, so the
    represented piecewise-linear field is unchanged at arbitrary points."""
    params = gridfield.init_grid_field(jax.random.PRNGKey(0), res=9,
                                       n_density=4, n_app=8,
                                       decoder_width=16, extent=1.5)
    up = gridfield.upsample_lines(params, 17)
    assert up["lines"]["x"].shape == (17, 12)
    # decoder/extent leaves are the SAME objects (passed through)
    assert up["decoder"] is params["decoder"]

    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-2.0, 2.0, (40, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    c0, s0 = gridfield.apply_grid_field(params, pts, dirs, n_density=4)
    c1, s1 = gridfield.apply_grid_field(up, pts, dirs, n_density=4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)
    for a, b in zip(c1, c0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_upsample_grid_state_resizes_params_and_moments():
    cfg = Config(fine_field="grid", grid_res=8, grid_comp_density=4,
                 grid_comp_app=8, grid_decoder_width=16,
                 proposal=True, prop_field="grid", prop_grid_res=8,
                 prop_grid_comp_density=4, prop_grid_comp_app=4,
                 prop_grid_decoder_width=8, use_pallas=False)
    state = trainlib.init_state(cfg, jax.random.PRNGKey(0))
    new = trainlib.upsample_grid_state(cfg, state, 12)
    for tree in (new.params, new.opt.mu, new.opt.nu):
        assert tree["net"]["lines"]["x"].shape[0] == 12
        # the proposal grid keeps its own resolution
        assert tree["prop"]["lines"]["x"].shape[0] == 8
    assert new.opt.count == state.opt.count
    assert new.iteration is state.iteration
    # nu stays a valid second moment
    assert (np.asarray(new.opt.nu["net"]["lines"]["x"]) >= 0).all()


def test_parse_grid_upsample():
    assert parse_grid_upsample("") == []
    assert parse_grid_upsample("4000:512, 2000:384") == [(2000, 384),
                                                         (4000, 512)]
    with pytest.raises(ValueError):
        parse_grid_upsample("2000:512,4000:384")  # resolution decreases
    with pytest.raises(ValueError):
        parse_grid_upsample("2000:384,2000:512")  # duplicate iteration
    with pytest.raises(ValueError):
        parse_grid_upsample("2000")  # not iter:res


def test_runner_upsample_exact_resume(sync_scene_dir, tmp_path):
    """Milestones land mid-chunk (single-step fallback), the field trains
    through two resolution jumps, and resume-from-checkpoint across a
    pending milestone reproduces the uninterrupted run exactly."""
    def make_cfg(sub, total):
        return Config(
            img_dir=sync_scene_dir, results_path=str(tmp_path / sub / "r"),
            ckpt_path=str(tmp_path / sub / "c"),
            log_dir=str(tmp_path / sub / "l"),
            total_iter=total, step=6, batch_ray=32, n_coarse=4, n_fine=4,
            learning=5e-3, use_pallas=False,
            fine_field="grid", grid_res=8, grid_comp_density=4,
            grid_comp_app=8, grid_decoder_width=16,
            grid_upsample="4:12,9:17")

    a = Runner(make_cfg("a", 6))
    a.train("train")  # runs milestone 4:12; ckpt at iter 5 carries R=12
    assert a.state.params["lines"]["x"].shape[0] == 12
    cfg_resume = make_cfg("a", 12)
    cfg_resume.continue_ = True
    a2 = Runner(cfg_resume)
    assert int(a2.state.iteration) == 6
    assert a2.state.params["lines"]["x"].shape[0] == 12
    a2.train("train")  # runs milestone 9:17 from the resumed stream

    b = Runner(make_cfg("b", 12))
    b.train("train")

    assert a2.state.params["lines"]["x"].shape[0] == 17
    for pa, pb in zip(jax.tree_util.tree_leaves(a2.state.params),
                      jax.tree_util.tree_leaves(b.state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)
