import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf import eval as evallib, train as trainlib
from tinynerf.config import Config
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable


def _cfg(**kw):
    base = dict(batch_ray=32, n_coarse=8, n_fine=8, use_pallas=False,
                render_chunk=64)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup(request):
    scene_dir = request.getfixturevalue("sync_scene_dir")
    table = RayTable(load_scene(scene_dir, "sync", "test"))
    k_inv = make_k_inv(table.height, table.width, table.focal)
    return table, k_inv


def test_psnr():
    a = np.zeros((4, 4, 3)); b = np.zeros((4, 4, 3))
    assert evallib.psnr(a, b) == float("inf")
    b += 0.1
    np.testing.assert_allclose(evallib.psnr(a, b), 20.0, rtol=1e-6)


def test_frame_fn_shape_and_chunks(setup):
    table, k_inv = setup
    state = trainlib.init_state(_cfg())
    pose = jnp.asarray(np.asarray(table.poses)[0])
    fn = evallib.make_frame_fn(_cfg(render_chunk=50), k_inv,
                               table.height, table.width)
    img = np.asarray(fn(state.params, pose))
    assert img.shape == (table.height, table.width, 3)
    assert np.all(np.isfinite(img))
    # the chunked lax.map tiling must not change the result
    fn2 = evallib.make_frame_fn(_cfg(render_chunk=144), k_inv,
                                table.height, table.width)
    np.testing.assert_allclose(img, np.asarray(fn2(state.params, pose)),
                               atol=1e-3)


def test_frame_fn_host_chunks_matches_lax_map(setup):
    """The serving-path host-chunk loop (one program per chunk, numpy out)
    must produce the same frame as the whole-frame lax.map program — incl.
    under PROPOSAL (whose frame compile the mode exists to sidestep) and
    with extras (depth/acc)."""
    table, k_inv = setup
    cfg = _cfg(render_chunk=50, proposal=True, prop_grid_res=8,
               prop_grid_comp_density=4, prop_grid_comp_app=4,
               prop_grid_decoder_width=8)
    state = trainlib.init_state(cfg)
    pose = jnp.asarray(np.asarray(table.poses)[0])
    ref_fn = evallib.make_frame_fn(cfg, k_inv, table.height, table.width)
    host_fn = evallib.make_frame_fn(cfg, k_inv, table.height, table.width,
                                    host_chunks=True)
    ref = np.asarray(ref_fn(state.params, pose))
    host = host_fn(state.params, pose)
    assert isinstance(host, np.ndarray)
    np.testing.assert_allclose(ref, host, atol=1e-5)

    ref_x = evallib.make_frame_fn(cfg, k_inv, table.height, table.width,
                                  extras=True)(state.params, pose)
    host_x = evallib.make_frame_fn(cfg, k_inv, table.height, table.width,
                                   extras=True, host_chunks=True)(
                                       state.params, pose)
    for r, h in zip(ref_x, host_x):
        np.testing.assert_allclose(np.asarray(r), h, atol=1e-5)

    # grouped serving dispatch (host_chunks=K>1): K chunks fold into one
    # program via an inner lax.map — including when K doesn't divide the
    # chunk count (padding chunks are dropped at assembly) and when K
    # exceeds it (clamped to one whole-frame-sized group)
    for k in (2, 3, 1000):
        grp_fn = evallib.make_frame_fn(cfg, k_inv, table.height,
                                       table.width, host_chunks=k)
        np.testing.assert_allclose(ref, grp_fn(state.params, pose),
                                   atol=1e-5)
    grp_x = evallib.make_frame_fn(cfg, k_inv, table.height, table.width,
                                  extras=True, host_chunks=3)(
                                      state.params, pose)
    for r, h in zip(ref_x, grp_x):
        np.testing.assert_allclose(np.asarray(r), h, atol=1e-5)


def test_render_test_set_artifacts(setup, tmp_path):
    table, k_inv = setup
    cfg = _cfg(results_path=str(tmp_path))
    state = trainlib.init_state(cfg)
    frames = evallib.render_test_set(cfg, state.params, table, k_inv,
                                     "teststamp", 99, save=True, max_views=2)
    assert frames.shape == (2, table.height, table.width, 3)
    import os
    assert os.path.isfile(tmp_path / "teststamp" / "0.jpg")
    assert os.path.isfile(tmp_path / "teststamp" / "1.jpg")
    assert (os.path.isfile(tmp_path / "teststamp_99.mp4")
            or os.path.isfile(tmp_path / "teststamp_99.gif"))
