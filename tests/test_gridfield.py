"""Factorized CP feature-grid field (FINE_FIELD=grid, core/gridfield.py):
hat-basis matmul lookup, gather equivalence, LR-scaled training, TV reg."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf import ckpt, eval as evallib, optim, train as trainlib
from tinynerf.config import Config
from tinynerf.core import gridfield
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable


def _cfg(**kw):
    base = dict(batch_ray=32, n_coarse=8, n_fine=8, use_pallas=False,
                proposal=True, learning=2e-3, render_chunk=64,
                fine_field="grid", grid_res=32, grid_comp_density=8,
                grid_comp_app=8, grid_decoder_width=16, grid_extent=6.0)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup(request):
    table = RayTable(load_scene(
        request.getfixturevalue("sync_scene_dir"), "sync", "train"))
    return table, make_k_inv(table.height, table.width, table.focal)


def test_param_count_and_shapes():
    p = gridfield.init_grid_field(jax.random.PRNGKey(0))
    # 3*256*80 lines + (72*16+16... default decoder) + extent
    assert gridfield.num_params(p) == 3 * 256 * 80 + (72 * 64 + 64) \
        + (64 * 3 + 3) + 1
    color, sigma = gridfield.apply_grid_field(
        p, jnp.zeros((4, 5, 3)), jnp.ones((4, 5, 3)))
    assert isinstance(color, tuple) and len(color) == 3
    assert color[0].shape == (4, 5) and sigma.shape == (4, 5, 1)
    assert float(jnp.min(sigma)) >= 0.0  # abs activation (Q14 family)


def test_onehot_matches_gather():
    """The hat-basis matmul IS the canonical 2-neighbour lerp."""
    p = gridfield.init_grid_field(jax.random.PRNGKey(1), res=16,
                                  n_density=4, n_app=4, decoder_width=8,
                                  extent=2.0)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), jnp.float32,
                             -3.0, 3.0)  # includes out-of-extent points
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (64, 1))
    c_m, s_m = gridfield.apply_grid_field(p, pts, dirs, n_density=4,
                                          lookup="onehot")
    c_g, s_g = gridfield.apply_grid_field(p, pts, dirs, n_density=4,
                                          lookup="gather")
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_g),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(c_m, c_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_lookup_is_linear_interp():
    """Feature at a point halfway between two cell centers equals the mean
    of the cell-center features (per axis)."""
    res, ext = 8, 1.0
    p = gridfield.init_grid_field(jax.random.PRNGKey(3), res=res,
                                  n_density=2, n_app=2, decoder_width=8,
                                  extent=ext)
    # x positions of cell centers i and i+1, and their midpoint
    def world(i):
        return (i / (res - 1)) * 2.0 * ext - ext
    pts = jnp.asarray([[world(2), 0.0, 0.0],
                       [world(3), 0.0, 0.0],
                       [(world(2) + world(3)) / 2.0, 0.0, 0.0]])
    fx, _fy, _fz = gridfield._line_features(
        p["lines"], pts, p["extent"], "onehot", jnp.float32)
    np.testing.assert_allclose(np.asarray(fx[2]),
                               np.asarray((fx[0] + fx[1]) / 2.0),
                               rtol=1e-5, atol=1e-6)
    # out-of-extent points clamp to the boundary value
    edge = gridfield._line_features(
        p["lines"], jnp.asarray([[ext, 0., 0.], [ext + 5., 0., 0.]]),
        p["extent"], "onehot", jnp.float32)[0]
    np.testing.assert_allclose(np.asarray(edge[0]), np.asarray(edge[1]),
                               rtol=1e-6)


def test_lr_scale_tree():
    # pin the MLP proposal so the prop subtree has no line tables: only
    # grid lines anywhere in the params get the multiplier (the default
    # grid proposal's lines DO get it — test_prop_grid_step_learns)
    cfg = _cfg(prop_field="mlp")
    state = trainlib.init_state(cfg)
    scale = trainlib.make_lr_scale(cfg, state.params)
    assert all(scale["net"]["lines"][ax] == cfg.grid_lr_mult
               for ax in ("x", "y", "z"))
    assert scale["net"]["decoder"]["hidden"]["w"] == 1.0
    for leaf in jax.tree_util.tree_leaves(scale["prop"]):
        assert leaf == 1.0
    # non-grid configs keep torch-exact single-LR Adam
    assert trainlib.make_lr_scale(Config(), state.params) is None


def test_adam_lr_scale_none_unchanged():
    """lr_scale=None must be bit-identical to the pre-change adam_update."""
    params = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([3.0])}
    grads = {"a": jnp.asarray([0.1, -0.2]), "b": jnp.asarray([0.3])}
    st = optim.adam_init(params)
    p_none, _ = optim.adam_update(grads, st, params, 1e-2)
    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    p_ones, _ = optim.adam_update(grads, st, params, 1e-2, lr_scale=ones)
    for a, b in zip(jax.tree_util.tree_leaves(p_none),
                    jax.tree_util.tree_leaves(p_ones)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grid_train_step_learns(setup):
    table, k_inv = setup
    cfg = _cfg()
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    lines_before = np.asarray(state.params["net"]["lines"]["x"])
    extent_before = float(state.params["net"]["extent"])
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first
    assert not np.allclose(np.asarray(state.params["net"]["lines"]["x"]),
                           lines_before)  # the grid actually trains
    assert float(state.params["net"]["extent"]) == extent_before  # frozen


def test_grid_shared_field_mode(setup):
    """FINE_FIELD=grid without PROPOSAL: the grid is the shared coarse+fine
    net under full reference pipeline semantics (Q8 leak, merged composite)
    — positions carry gradients through the hat basis and it still trains."""
    table, k_inv = setup
    cfg = _cfg(proposal=False)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first


def test_grid_tv_regularizer(setup):
    p = gridfield.init_grid_field(jax.random.PRNGKey(0), res=16,
                                  n_density=4, n_app=4)
    tv = float(gridfield.tv_loss(p))
    assert np.isfinite(tv) and tv > 0.0
    smooth = jax.tree_util.tree_map(jnp.zeros_like, p)
    assert float(gridfield.tv_loss(smooth)) == 0.0
    # TV term reaches the loss and its gradient touches only the lines
    table, k_inv = setup
    cfg = _cfg(grid_tv=1e3)
    cfg0 = _cfg(grid_tv=0.0)
    state = trainlib.init_state(cfg)
    batch = table.sample(jax.random.PRNGKey(3), cfg.batch_ray)
    l1 = float(trainlib.make_loss_fn(cfg, k_inv)(
        state.params, batch, None, None)[0])
    l0 = float(trainlib.make_loss_fn(cfg0, k_inv)(
        state.params, batch, None, None)[0])
    expected = 1e3 * float(gridfield.tv_loss(state.params["net"]))
    np.testing.assert_allclose(l1 - l0, expected, rtol=1e-4)


def test_grid_eval_ckpt_and_occ(setup, tmp_path):
    """Frame render + checkpoint roundtrip + occ-grid refresh all work off
    the grid param tree (the occ sweep probes the grid field directly)."""
    table, k_inv = setup
    cfg = _cfg(occ_grid=True, occ_res=8, occ_extent=6.0, occ_update_every=1,
               white_bkgd=True)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    for _ in range(2):
        state, m = step(state)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(np.asarray(state.occ.raw)).any()

    frame_fn = evallib.make_frame_fn(cfg, k_inv, table.height, table.width)
    img = np.asarray(frame_fn(state.params,
                              jnp.asarray(np.asarray(table.poses)[0])))
    assert img.shape == (table.height, table.width, 3)
    assert np.isfinite(img).all()

    path = ckpt.save_checkpoint(str(tmp_path), "t", 0,
                                jax.device_get(state.params),
                                jax.device_get(state.opt))
    _it, params2, _opt2, _k, _o = ckpt.load_checkpoint_full(path)
    for a, b in zip(jax.tree_util.tree_leaves(params2),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grid_sharded_step_on_mesh(setup):
    table, k_inv = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    from tinynerf.parallel import mesh as meshlib
    cfg = _cfg()
    mesh = meshlib.make_mesh(8)
    step = trainlib.make_train_step(
        cfg, table, k_inv, batch_sharding=meshlib.batch_sharding(mesh))
    state = meshlib.replicate_state(trainlib.init_state(cfg), mesh)
    state, m = step(state)
    assert np.isfinite(float(m["loss"]))


def test_prop_grid_step_learns(setup):
    """PROP_FIELD=grid: the proposal pass runs on a tiny CP grid (zero PE
    transcendentals). Both grid trees train, and the LR mult reaches the
    proposal grid's lines too."""
    table, k_inv = setup
    cfg = _cfg(prop_field="grid", prop_grid_res=16, prop_grid_comp_density=4,
               prop_grid_comp_app=4, prop_grid_decoder_width=8)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    assert "lines" in state.params["prop"]  # grid tree, not an MLP stack
    scale = trainlib.make_lr_scale(cfg, state.params)
    assert scale["prop"]["lines"]["x"] == cfg.grid_lr_mult
    prop_before = np.asarray(state.params["prop"]["lines"]["x"])
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first
    assert not np.allclose(np.asarray(state.params["prop"]["lines"]["x"]),
                           prop_before)


def test_prop_grid_with_mlp_fine(setup):
    """PROP_FIELD=grid composes with the reference MLP fine field."""
    table, k_inv = setup
    cfg = _cfg(fine_field="mlp", prop_field="grid", prop_grid_res=16,
               prop_grid_comp_density=4, prop_grid_comp_app=4,
               prop_grid_decoder_width=8)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    from tinynerf.core import mlp
    assert mlp.num_params(state.params["net"]) == 593_924
    state, m = step(state)
    assert np.isfinite(float(m["loss"]))


def test_grid_ndc_llff_scene(llff_scene_dir):
    """FINE_FIELD=grid on an LLFF/NDC scene: after the NDC warp, sample
    points live in roughly [-1,1]^2 x [0,1], so a unit-extent grid covers
    the frustum and the full prop-grid + fine-grid stack trains."""
    table = RayTable(load_scene(llff_scene_dir, "llff", "train"))
    k_inv = make_k_inv(table.height, table.width, table.focal)
    cfg = _cfg(grid_extent=1.0, prop_field="grid", prop_grid_res=16,
               prop_grid_comp_density=4, prop_grid_comp_app=4,
               prop_grid_decoder_width=8)
    ndc_params = (float(table.height), float(table.width),
                  float(table.focal))
    step = trainlib.make_train_step(cfg, table, k_inv,
                                    ndc_params=ndc_params)
    state = trainlib.init_state(cfg)
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first


def test_grid_bf16_path():
    cfg = _cfg(precision="bf16")
    field = trainlib.make_field_fn(cfg)
    p = gridfield.init_grid_field(jax.random.PRNGKey(0), res=32,
                                  n_density=cfg.grid_comp_density,
                                  n_app=cfg.grid_comp_app,
                                  decoder_width=cfg.grid_decoder_width,
                                  extent=cfg.grid_extent)
    pts = jnp.asarray([[1.37291, -0.84133, 0.42977]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    c16, s16 = field(p, pts, dirs)
    c32, s32 = gridfield.apply_grid_field(p, pts, dirs,
                                          n_density=cfg.grid_comp_density)
    assert s16.dtype == jnp.float32  # outputs cast back for the composite
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=0.05,
                               rtol=0.1)


def test_hybrid_shapes_and_lr_scale():
    """GRID_HYBRID: sigma comes from the tiny density MLP (cross-component
    mixing), its hidden features join the color input, and the sigma-net
    leaves train at the BASE LR (only lines get GRID_LR_MULT)."""
    p = gridfield.init_grid_field(jax.random.PRNGKey(0), res=32,
                                  n_density=8, n_app=8, decoder_width=16,
                                  extent=2.0, hybrid=True)
    assert "sigma_net" in p
    assert p["sigma_net"]["hidden"]["w"].shape == (8, 16)
    # decoder hidden widened by the sigma-net features
    from tinynerf.core.encoding import DIR_ENC_DIM
    assert p["decoder"]["hidden"]["w"].shape == (DIR_ENC_DIM + 8 + 16, 16)
    color, sigma = gridfield.apply_grid_field(
        p, jnp.zeros((4, 5, 3)), jnp.ones((4, 5, 3)), n_density=8)
    assert color[0].shape == (4, 5) and sigma.shape == (4, 5, 1)
    assert float(jnp.min(sigma)) >= 0.0

    cfg = _cfg(grid_hybrid=True, prop_field="mlp")
    state = trainlib.init_state(cfg)
    scale = trainlib.make_lr_scale(cfg, state.params)
    for leaf in jax.tree_util.tree_leaves(scale["net"]["sigma_net"]):
        assert leaf == 1.0
    assert all(scale["net"]["lines"][ax] == cfg.grid_lr_mult
               for ax in ("x", "y", "z"))


def test_hybrid_train_step_learns(setup):
    table, k_inv = setup
    cfg = _cfg(grid_hybrid=True)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    sn_before = np.asarray(state.params["net"]["sigma_net"]["hidden"]["w"])
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first
    assert not np.allclose(
        np.asarray(state.params["net"]["sigma_net"]["hidden"]["w"]),
        sn_before)  # the density MLP actually trains


def test_hybrid_rejects_grid_pallas():
    cfg = _cfg(grid_hybrid=True, grid_pallas=True)
    with pytest.raises(ValueError, match="GRID_HYBRID"):
        trainlib.make_field_fn(cfg, force_pallas=True)


def test_prop_hybrid_step_learns(setup):
    """PROP_GRID_HYBRID: the proposal grid gets its own density MLP; the
    combined {net, prop} step still trains (detection is data-driven via
    the sigma_net leaf, so the prop field fn needs no flag)."""
    table, k_inv = setup
    cfg = _cfg(grid_hybrid=True, prop_grid_hybrid=True)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    assert "sigma_net" in state.params["prop"]
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first


def test_hybrid_sigma_width_knob():
    """GRID_SIGMA_WIDTH sizes the sigma-net hidden independently of the
    color decoder; 0 falls back to decoder_width."""
    p = gridfield.init_grid_field(jax.random.PRNGKey(0), res=16,
                                  n_density=4, n_app=4, decoder_width=16,
                                  extent=2.0, hybrid=True, sigma_width=8)
    assert p["sigma_net"]["hidden"]["w"].shape == (4, 8)
    from tinynerf.core.encoding import DIR_ENC_DIM
    assert p["decoder"]["hidden"]["w"].shape == (DIR_ENC_DIM + 4 + 8, 16)
    color, sigma = gridfield.apply_grid_field(
        p, jnp.zeros((2, 3, 3)), jnp.ones((2, 3, 3)), n_density=4)
    assert sigma.shape == (2, 3, 1)


# ---------------------------------------------------------------------------
# GRID_LEVELS (multi-resolution CP pyramid) — VERDICT r3 item 1
# ---------------------------------------------------------------------------

def test_levels_init_bit_equal_to_single_level():
    """Extra pyramid levels are zero-init: a levels=3 field's output must be
    BIT-identical to levels=1 at matching init (same key -> same level-0
    tables and decoder; the added tables contribute exactly zero)."""
    kw = dict(res=32, n_density=4, n_app=4, decoder_width=8, extent=2.0,
              hybrid=True)
    p1 = gridfield.init_grid_field(jax.random.PRNGKey(7), levels=1, **kw)
    p3 = gridfield.init_grid_field(jax.random.PRNGKey(7), levels=3, **kw)
    assert set(p3["lines"]) == {"x", "y", "z", "x1", "y1", "z1",
                                "x2", "y2", "z2"}
    assert p3["lines"]["x1"].shape == (16, 8)
    assert p3["lines"]["x2"].shape == (8, 8)
    pts = jax.random.uniform(jax.random.PRNGKey(8), (32, 3), jnp.float32,
                             -2.5, 2.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
    c1, s1 = gridfield.apply_grid_field(p1, pts, dirs, n_density=4)
    c3, s3 = gridfield.apply_grid_field(p3, pts, dirs, n_density=4)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s3))
    for a, b in zip(c1, c3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_levels_gradients_reach_every_level():
    """Every pyramid table receives gradient (the coarse hat bases spread
    each sample over wider support — no level is dead at init)."""
    p = gridfield.init_grid_field(jax.random.PRNGKey(9), res=32, n_density=4,
                                  n_app=4, decoder_width=8, extent=2.0,
                                  levels=2)
    pts = jax.random.uniform(jax.random.PRNGKey(10), (64, 3), jnp.float32,
                             -1.5, 1.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (64, 1))

    def loss(params):
        color, sigma = gridfield.apply_grid_field(params, pts, dirs,
                                                  n_density=4)
        return jnp.sum(sigma) + sum(jnp.sum(c) for c in color)

    g = jax.grad(loss)(p)
    for name in ("x", "y", "z", "x1", "y1", "z1"):
        assert float(jnp.abs(g["lines"][name]).max()) > 0.0, name


def test_levels_interp_sums_levels():
    """_line_features with a pyramid = sum of per-level interpolations."""
    p = gridfield.init_grid_field(jax.random.PRNGKey(11), res=16,
                                  n_density=2, n_app=2, decoder_width=8,
                                  extent=1.0, levels=2)
    # give level 1 real content so the sum is observable
    lines = dict(p["lines"])
    lines["x1"] = 0.5 * jax.random.normal(jax.random.PRNGKey(12),
                                          lines["x1"].shape, jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(13), (16, 3), jnp.float32,
                             -1.0, 1.0)
    fx = gridfield._line_features(lines, pts, p["extent"], "onehot",
                                  jnp.float32)[0]
    only0 = {k: v for k, v in lines.items() if k in gridfield.AXES}
    only1 = dict(only0)
    only1["x"] = jnp.zeros_like(lines["x"])
    only1["x1"] = lines["x1"]
    fx0 = gridfield._line_features(only0, pts, p["extent"], "onehot",
                                   jnp.float32)[0]
    fx1 = gridfield._line_features(only1, pts, p["extent"], "onehot",
                                   jnp.float32)[0]
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fx0 + fx1),
                               rtol=1e-5, atol=1e-6)


def test_levels_tv_and_lr_scale_cover_pyramid():
    cfg = _cfg(grid_levels=2)
    state = trainlib.init_state(cfg)
    scale = trainlib.make_lr_scale(cfg, state.params)
    for name in ("x", "y", "z", "x1", "y1", "z1"):
        assert scale["net"]["lines"][name] == cfg.grid_lr_mult
    # tv_loss covers every level: zeroing level-1 tables changes nothing
    # only if they are already smooth (zero-init) — perturb to check
    p = state.params["net"]
    tv0 = float(gridfield.tv_loss(p))
    bumped = dict(p)
    bumped["lines"] = dict(p["lines"])
    bumped["lines"]["x1"] = p["lines"]["x1"].at[0, 0].set(5.0)
    assert float(gridfield.tv_loss(bumped)) > tv0


def test_level_fold_matches_per_level_interp_on_nested_lattices():
    """GRID_LEVEL_FOLD (upsample-then-sum, one hat matmul) represents the
    exact same piecewise-linear function as interpolate-per-level when the
    lattices nest: res 17 -> level res ((17-1)>>1)+1 = 9, 16 % 8 == 0."""
    p = gridfield.init_grid_field(jax.random.PRNGKey(20), res=17,
                                  n_density=2, n_app=2, decoder_width=8,
                                  extent=1.0, levels=2)
    assert p["lines"]["x1"].shape[0] == 9
    lines = dict(p["lines"])
    for name in ("x1", "y1", "z1"):   # real content, not the zero init
        lines[name] = 0.5 * jax.random.normal(jax.random.PRNGKey(21),
                                              lines[name].shape, jnp.float32)
    pts = jax.random.uniform(jax.random.PRNGKey(22), (64, 3), jnp.float32,
                             -1.2, 1.2)
    for a in range(3):
        f_sum = gridfield._line_features(lines, pts, p["extent"], "onehot",
                                         jnp.float32)[a]
        f_fold = gridfield._line_features(lines, pts, p["extent"], "onehot",
                                          jnp.float32, fold=True)[a]
        np.testing.assert_allclose(np.asarray(f_fold), np.asarray(f_sum),
                                   rtol=2e-5, atol=2e-6)
    # and gradients still reach the level tables through the fold
    def loss(ls):
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (64, 1))
        params = dict(p, lines=ls)
        color, sigma = gridfield.apply_grid_field(params, pts, dirs,
                                                  n_density=2, fold=True)
        return jnp.sum(sigma) + sum(jnp.sum(c) for c in color)
    g = jax.grad(loss)(lines)
    for name in ("x", "x1", "y1", "z1"):
        assert float(jnp.abs(g[name]).max()) > 0.0, name


def test_level_fold_zero_init_bit_equal_and_train_step(setup):
    """Zero-init levels fold to table + 0: a folded levels=L field starts
    bit-equal to levels=1, and the flagship-shaped train step runs with
    GRID_LEVEL_FOLD on."""
    kw = dict(res=32, n_density=4, n_app=4, decoder_width=8, extent=2.0)
    p1 = gridfield.init_grid_field(jax.random.PRNGKey(7), levels=1, **kw)
    p2 = gridfield.init_grid_field(jax.random.PRNGKey(7), levels=2, **kw)
    pts = jax.random.uniform(jax.random.PRNGKey(8), (32, 3), jnp.float32,
                             -2.5, 2.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (32, 1))
    c1, s1 = gridfield.apply_grid_field(p1, pts, dirs, n_density=4)
    c2, s2 = gridfield.apply_grid_field(p2, pts, dirs, n_density=4, fold=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    table, k_inv = setup
    cfg = _cfg(grid_levels=2, grid_hybrid=True, grid_level_fold=True)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    losses = []
    for _ in range(8):
        state, m = step(state)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_level_lr_scales_per_level():
    """GRID_LEVEL_LR routes a geometric per-level factor onto pyramid
    tables only: level l trains at grid_lr_mult * level_lr**l."""
    cfg = _cfg(grid_levels=3, grid_level_lr=0.5)
    state = trainlib.init_state(cfg)
    scale = trainlib.make_lr_scale(cfg, state.params)
    for ax in ("x", "y", "z"):
        assert scale["net"]["lines"][ax] == cfg.grid_lr_mult
        assert scale["net"]["lines"][f"{ax}1"] == cfg.grid_lr_mult * 0.5
        assert scale["net"]["lines"][f"{ax}2"] == cfg.grid_lr_mult * 0.25
    # non-line leaves (decoder, prop subtree) stay at the base rate
    assert scale["net"]["decoder"]["hidden"]["w"] == 1.0
    # level_lr alone (grid_lr_mult=1) still produces a scale tree
    cfg1 = _cfg(grid_levels=2, grid_lr_mult=1.0, grid_level_lr=4.0)
    state1 = trainlib.init_state(cfg1)
    scale1 = trainlib.make_lr_scale(cfg1, state1.params)
    assert scale1["net"]["lines"]["x"] == 1.0
    assert scale1["net"]["lines"]["x1"] == 4.0
    # and the default stays None (single-LR torch-exact path)
    assert trainlib.make_lr_scale(Config(), state.params) is None


def test_levels_upsample_rejected():
    p = gridfield.init_grid_field(jax.random.PRNGKey(0), res=16,
                                  n_density=2, n_app=2, levels=2)
    with pytest.raises(ValueError, match="GRID_LEVELS"):
        gridfield.upsample_lines(p, 32)
    # and the config-level guard fires at init_state on EVERY path,
    # including resume (ADVICE r3: it used to hide in the params-None branch)
    cfg = _cfg(grid_levels=2, grid_upsample=((32, 100),))
    with pytest.raises(ValueError, match="GRID_UPSAMPLE is incompatible"):
        trainlib.init_state(cfg)
    with pytest.raises(ValueError, match="GRID_UPSAMPLE is incompatible"):
        trainlib.init_state(cfg, params={"fake": jnp.zeros(1)})


def test_levels_train_step_learns_and_resumes(setup, tmp_path, capsys):
    """End-to-end: hybrid flagship shape + levels=2 trains, checkpoints,
    resumes bit-exact; resuming under a mismatched GRID_LEVELS warns."""
    table, k_inv = setup
    cfg = _cfg(grid_levels=2, grid_hybrid=True)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    l1_before = np.asarray(state.params["net"]["lines"]["x1"])
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first
    assert not np.allclose(np.asarray(state.params["net"]["lines"]["x1"]),
                           l1_before)  # level 1 leaves zero-init behind
    path = ckpt.save_checkpoint(str(tmp_path), "t", 19,
                                jax.device_get(state.params),
                                jax.device_get(state.opt))
    _it, params2, opt2, _k, _o = ckpt.load_checkpoint_full(path)
    resumed = trainlib.init_state(cfg, params=params2, opt_state=opt2,
                                  iteration=20)
    for a, b in zip(jax.tree_util.tree_leaves(resumed.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    capsys.readouterr()
    trainlib.init_state(_cfg(grid_levels=1, grid_hybrid=True),
                        params=params2, opt_state=opt2, iteration=20)
    out = capsys.readouterr().out
    assert "2 grid level(s)" in out and "GRID_LEVELS=1" in out
