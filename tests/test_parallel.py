"""Distributed correctness on the 8-fake-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tinynerf import train as trainlib
from tinynerf.config import Config
from tinynerf.core import render
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable
from tinynerf.parallel import mesh as meshlib
from tinynerf.parallel import sample_shard


def _cfg(**kw):
    base = dict(batch_ray=32, n_coarse=8, n_fine=16, use_pallas=False)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup(request):
    scene_dir = request.getfixturevalue("sync_scene_dir")
    table = RayTable(load_scene(scene_dir, "sync", "train"))
    k_inv = make_k_inv(table.height, table.width, table.focal)
    return table, k_inv


def test_eight_fake_devices():
    assert len(jax.devices()) == 8


def _compare_shardmap(setup, cfg, grad_rtol, grad_atol):
    table, k_inv = setup
    loss_fn = trainlib.make_loss_fn(cfg, k_inv)
    state = trainlib.init_state(cfg)
    batch = table.sample(jax.random.PRNGKey(3), cfg.batch_ray)
    key = jax.random.PRNGKey(0)

    (loss_ref, _), grads_ref = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, batch, key)

    mesh = meshlib.make_mesh(8)
    grad_fn = meshlib.make_shardmap_grad_fn(loss_fn, mesh)
    loss_sh, grads_sh = grad_fn(state.params, batch, key)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_ref),
                    jax.tree_util.tree_leaves(grads_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=grad_rtol, atol=grad_atol)


def test_shardmap_grads_equal_single_device_coarse(setup):
    # coarse-only: no inverse-CDF bin select, so psum'd grads must match the
    # single-device grads to fp32 tolerance
    _compare_shardmap(setup, _cfg(n_fine=0), grad_rtol=2e-4, grad_atol=1e-5)


def test_shardmap_grads_equal_single_device_full(setup):
    # with the fine pass, 1-ulp compilation differences can flip an
    # inverse-CDF bin index and discretely reroute a sample's gradient path;
    # losses still agree to ~1e-6, so compare grads directionally
    table, k_inv = setup
    cfg = _cfg()
    loss_fn = trainlib.make_loss_fn(cfg, k_inv)
    state = trainlib.init_state(cfg)
    batch = table.sample(jax.random.PRNGKey(3), cfg.batch_ray)
    key = jax.random.PRNGKey(0)

    (loss_ref, _), grads_ref = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, batch, key)
    mesh = meshlib.make_mesh(8)
    loss_sh, grads_sh = meshlib.make_shardmap_grad_fn(loss_fn, mesh)(
        state.params, batch, key)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    a = np.concatenate([np.asarray(g).ravel()
                        for g in jax.tree_util.tree_leaves(grads_ref)])
    b = np.concatenate([np.asarray(g).ravel()
                        for g in jax.tree_util.tree_leaves(grads_sh)])
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos
    # 0.25: a single flipped bin reroutes one of the resampler's huge
    # 1/(dense+1e-7) slope-gradient elements, moving the NORM by ~10% while
    # the direction stays aligned (see VALIDATION.md round-2 fp-conditioning
    # analysis); the norm bound only guards against gross scaling errors
    # (e.g. a missing psum divides by the mesh size -> ratio 8)
    assert abs(np.linalg.norm(a) / np.linalg.norm(b) - 1) < 0.25


@pytest.mark.parametrize("n_fine,loss_rtol,param_atol", [
    (0, 1e-5, 2e-6),    # coarse-only: exact modulo fp32
    (16, 5e-2, 5e-3),   # full: resample bin flips drift losses chaotically
])
def test_pjit_sharded_step_matches_unsharded(setup, n_fine, loss_rtol,
                                             param_atol):
    table, k_inv = setup
    cfg = _cfg(n_fine=n_fine)
    mesh = meshlib.make_mesh(8)

    step_plain = trainlib.make_train_step(cfg, table, k_inv)
    step_shard = trainlib.make_train_step(
        cfg, table, k_inv, batch_sharding=meshlib.batch_sharding(mesh))

    s1 = trainlib.init_state(cfg)
    s2 = meshlib.replicate_state(trainlib.init_state(cfg), mesh)
    for _ in range(3):
        s1, m1 = step_plain(s1)
        s2, m2 = step_shard(s2)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=loss_rtol)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=param_atol)


def test_sharded_render_equals_unsharded(setup):
    table, k_inv = setup
    cfg = _cfg()
    state = trainlib.init_state(cfg)
    field_fn = trainlib.make_field_fn(cfg)

    def render_fn(params, rows, cols, pose17):
        _, c_fine = render.render_rays(params, rows, cols, pose17, k_inv,
                                       cfg.n_coarse, cfg.n_fine,
                                       field_fn=field_fn)
        return c_fine

    batch = table.sample(jax.random.PRNGKey(5), 64)
    plain = render_fn(state.params, batch.rows, batch.cols, batch.pose17)
    mesh = meshlib.make_mesh(8)
    sharded_fn = meshlib.sharded_render_chunk(render_fn, mesh)
    sharded = sharded_fn(state.params, batch.rows, batch.cols, batch.pose17)
    # atol covers inverse-CDF bin-flip noise between compilations (see above)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               rtol=1e-3, atol=1e-3)


def test_sharded_frame_fn_equals_unsharded(setup):
    """Mesh-sharded whole-frame render (pod-scale eval path) must equal the
    single-device frame render."""
    from tinynerf import eval as evallib
    table, k_inv = setup
    cfg = _cfg(render_chunk=48)
    state = trainlib.init_state(cfg)
    pose = jnp.asarray(np.asarray(table.poses)[0])

    plain_fn = evallib.make_frame_fn(cfg, k_inv, table.height, table.width)
    mesh = meshlib.make_mesh(8)
    shard_fn = evallib.make_frame_fn(
        cfg, k_inv, table.height, table.width,
        batch_sharding=meshlib.batch_sharding(mesh))
    plain = np.asarray(plain_fn(state.params, pose))
    sharded = np.asarray(shard_fn(
        meshlib.replicate_state(state, mesh).params, pose))
    np.testing.assert_allclose(sharded, plain, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sample_axis_prefix_scan_matches_cumsum(n_dev):
    """The SP-analog: sample-axis-sharded density == single-device density."""
    rng = np.random.default_rng(0)
    B, N = 4, 32
    delta = rng.uniform(0.01, 0.1, (B, N)).astype(np.float32)
    sigma = rng.uniform(0.0, 5.0, (B, N)).astype(np.float32)
    rgb = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)

    expected_w = render.get_density(jnp.asarray(delta), jnp.asarray(sigma))
    expected_c = render.composite(expected_w, jnp.asarray(rgb))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("sample",))

    def local(delta, sigma, rgb):
        w = sample_shard.sharded_get_density(delta, sigma, "sample")
        c = sample_shard.sharded_composite(w, rgb, "sample")
        return w, c

    w_sh, c_sh = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "sample"), P(None, "sample"), P(None, "sample")),
        out_specs=(P(None, "sample"), P()),
        check_vma=False,
    )(jnp.asarray(delta), jnp.asarray(sigma), jnp.asarray(rgb))

    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(expected_w),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(expected_c),
                               rtol=1e-5, atol=1e-6)


def test_sharded_occ_refresh_matches_unsharded():
    """The occupancy refresh's cell evals partition over the mesh
    (update_grid cell_sharding); results must equal the unsharded refresh."""
    from tinynerf.core import occupancy

    def field(params, points, dirs):
        dist = jnp.linalg.norm(points, axis=-1, keepdims=True)
        return jnp.ones(points.shape[:-1] + (3,)), jnp.where(dist < 0.5, 5.0, 0.0)

    mesh = meshlib.make_mesh(8)
    sharding = meshlib.batch_sharding(mesh)
    key = jax.random.PRNGKey(4)
    grid0 = occupancy.init_grid(resolution=16, half_extent=1.0)

    plain = occupancy.update_grid(grid0, None, field, key, ema=0.0,
                                  subset=1024)
    sharded = jax.jit(lambda g: occupancy.update_grid(
        g, None, field, key, ema=0.0, subset=1024,
        cell_sharding=sharding))(grid0)
    np.testing.assert_allclose(np.asarray(sharded.raw), np.asarray(plain.raw),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.density),
                               np.asarray(plain.density), atol=1e-6)

    # full-sweep path too (chunked eval under the constraint)
    plain_f = occupancy.update_grid(grid0, None, field, key, ema=0.0)
    sharded_f = jax.jit(lambda g: occupancy.update_grid(
        g, None, field, key, ema=0.0, cell_sharding=sharding))(grid0)
    np.testing.assert_allclose(np.asarray(sharded_f.density),
                               np.asarray(plain_f.density), atol=1e-6)


@pytest.mark.parametrize("n_sample", [2, 4])
def test_sharded_merged_fine_matches_merged_composite(n_sample):
    """Sample-sharded merged composite == single-device merged_composite
    on the concatenation of the shards' fine samples."""
    rng = np.random.default_rng(1)
    B, NC, NF = 4, 8, 16
    t_co = np.sort(rng.uniform(2, 6, (B, NC)), axis=1).astype(np.float32)
    t_fi = np.sort(rng.uniform(2, 6, (B, NF)), axis=1).astype(np.float32)
    s_co = rng.uniform(0, 3, (B, NC)).astype(np.float32)
    s_fi = rng.uniform(0, 3, (B, NF)).astype(np.float32)
    c_co = rng.uniform(0, 1, (3, B, NC)).astype(np.float32)
    c_fi = rng.uniform(0, 1, (3, B, NF)).astype(np.float32)

    expected = render.merged_composite(
        jnp.asarray(t_co), jnp.asarray(t_fi), jnp.asarray(s_co),
        jnp.asarray(s_fi), tuple(jnp.asarray(c) for c in c_co),
        tuple(jnp.asarray(c) for c in c_fi), white_bkgd=True)

    mesh = Mesh(np.array(jax.devices()[:n_sample]), ("sample",))

    def local(t_fi_l, s_fi_l, r_l, g_l, b_l):
        return sample_shard.sharded_merged_fine(
            jnp.asarray(t_co), t_fi_l, jnp.asarray(s_co), s_fi_l,
            tuple(jnp.asarray(c) for c in c_co), (r_l, g_l, b_l),
            white_bkgd=True, axis_name="sample")

    got = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "sample"),) * 5,
        out_specs=P(),
        check_vma=False,
    )(jnp.asarray(t_fi), jnp.asarray(s_fi), *(jnp.asarray(c) for c in c_fi))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_sample_sharded_render_deep_march(setup):
    """SAMPLE_SHARD deep-march path: N_FINE=512 on a 2x4 (data x sample)
    mesh == single-device render_rays (twolist merge). Per-device mask
    memory is (B/2, 8, 128) vs the single-device (B, 8, 512)."""
    table, k_inv = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    from tinynerf.core import mlp
    params = mlp.init_network(jax.random.PRNGKey(0))
    B, NC, NF = 8, 8, 512
    rng = np.random.default_rng(2)
    rows = jnp.asarray(rng.uniform(0, table.height, B).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, table.width, B).astype(np.float32))
    pose = jnp.asarray(np.tile(np.asarray(table.poses)[0], (B, 1)))

    mesh = meshlib.make_mesh_2d(2, 4)
    fn = sample_shard.make_sample_sharded_render(mesh, k_inv, NC, NF,
                                                 white_bkgd=True)
    c_co_sh, c_fi_sh = fn(params, rows, cols, pose)

    c_co, c_fi = render.render_rays(params, rows, cols, pose, k_inv, NC, NF,
                                    merge_impl="twolist", white_bkgd=True)
    np.testing.assert_allclose(np.asarray(c_co_sh), np.asarray(c_co),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_fi_sh), np.asarray(c_fi),
                               rtol=1e-4, atol=1e-4)


def test_sample_shard_frame_fn_matches_unsharded(setup):
    """The SAMPLE_SHARD config key routes eval frames through the
    sample-sharded renderer; output must match the plain frame path."""
    table, k_inv = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    from tinynerf import eval as evallib
    state = trainlib.init_state(_cfg())
    pose = jnp.asarray(np.asarray(table.poses)[0])

    cfg_sh = _cfg(sample_shard=4, render_chunk=64)
    mesh = meshlib.mesh_for_config(cfg_sh)
    assert dict(mesh.shape) == {"data": 2, "sample": 4}
    fn_sh = evallib.make_frame_fn(cfg_sh, k_inv, table.height, table.width,
                                  batch_sharding=meshlib.batch_sharding(mesh))
    fn = evallib.make_frame_fn(_cfg(render_chunk=64), k_inv,
                               table.height, table.width)
    np.testing.assert_allclose(
        np.asarray(fn_sh(state.params, pose)),
        np.asarray(fn(state.params, pose)), rtol=1e-4, atol=1e-4)
