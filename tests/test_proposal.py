"""Proposal-style coarse field (PROPOSAL config): narrow coarse net,
full-size fine net, reference pipeline otherwise (core/proposal.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinynerf import ckpt, eval as evallib, train as trainlib
from tinynerf.config import Config
from tinynerf.core import proposal, render
from tinynerf.core.rays import make_k_inv
from tinynerf.data.poses import load_scene
from tinynerf.data.rays import RayTable


def _cfg(**kw):
    base = dict(batch_ray=32, n_coarse=8, n_fine=8, use_pallas=False,
                proposal=True, learning=2e-3, render_chunk=64)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup(request):
    table = RayTable(load_scene(
        request.getfixturevalue("sync_scene_dir"), "sync", "train"))
    return table, make_k_inv(table.height, table.width, table.focal)


def test_proposal_param_count_and_shapes():
    p = proposal.init_proposal(jax.random.PRNGKey(0))
    n = sum(int(np.prod(v.shape)) for layer in p.values()
            for v in layer.values())
    assert n == 57_932  # ~9x fewer MACs/point than the 593,924-param net
    color, sigma = proposal.field_proposal(
        p, jnp.zeros((4, 5, 3)), jnp.ones((4, 5, 3)))
    assert color.shape == (4, 5, 3) and sigma.shape == (4, 5, 1)
    assert float(jnp.min(sigma)) >= 0.0  # abs activation (Q14 family)


def test_init_state_builds_combined_tree():
    state = trainlib.init_state(_cfg())
    assert set(state.params.keys()) == {"net", "prop"}
    # the main net is the full reference architecture, untouched
    from tinynerf.core import mlp
    assert mlp.num_params(state.params["net"]) == 593_924


def test_proposal_train_step_learns(setup):
    table, k_inv = setup
    cfg = _cfg()
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first


def test_proposal_grads_reach_both_nets(setup):
    table, k_inv = setup
    cfg = _cfg()
    loss_fn = trainlib.make_loss_fn(cfg, k_inv)
    state = trainlib.init_state(cfg)
    batch = table.sample(jax.random.PRNGKey(3), cfg.batch_ray)
    grads = jax.grad(lambda p: loss_fn(p, batch, None, None)[0])(state.params)
    for part in ("net", "prop"):
        norms = [float(jnp.linalg.norm(g))
                 for g in jax.tree_util.tree_leaves(grads[part])]
        assert max(norms) > 0.0, f"no gradient reached {part}"


def test_proposal_off_matches_baseline(setup):
    """PROPOSAL=False must be bit-identical to the pre-proposal pipeline
    (pure refactor for the default path)."""
    table, k_inv = setup
    state = trainlib.init_state(Config(use_pallas=False))
    rows = jnp.asarray([1.0, 2.0, 3.0])
    cols = jnp.asarray([3.0, 2.0, 1.0])
    pose = jnp.asarray(np.tile(np.asarray(table.poses)[0], (3, 1)))
    base = render.render_rays(state.params, rows, cols, pose, k_inv, 4, 4)
    again = render.render_rays(state.params, rows, cols, pose, k_inv, 4, 4,
                               prop_params=None)
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(again[1]))


def test_proposal_eval_and_ckpt_roundtrip(setup, tmp_path):
    table, k_inv = setup
    cfg = _cfg()
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    state, _ = step(state)

    frame_fn = evallib.make_frame_fn(cfg, k_inv, table.height, table.width)
    img = np.asarray(frame_fn(state.params,
                              jnp.asarray(np.asarray(table.poses)[0])))
    assert img.shape == (table.height, table.width, 3)
    assert np.isfinite(img).all()

    path = ckpt.save_checkpoint(str(tmp_path), "t", 0,
                                jax.device_get(state.params),
                                jax.device_get(state.opt))
    _it, params2, opt2, _k, _o = ckpt.load_checkpoint_full(path)
    for a, b in zip(jax.tree_util.tree_leaves(params2),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state steps identically to the in-memory one (the step fn
    # donates its input, so each call gets a fresh host-roundtripped copy)
    fresh = lambda s: jax.tree_util.tree_map(jnp.asarray, jax.device_get(s))
    _s, m_mem = step(fresh(state))
    _s, m_res = step(fresh(state._replace(params=params2, opt=opt2)))
    np.testing.assert_allclose(float(m_mem["loss"]), float(m_res["loss"]),
                               rtol=1e-6)


def test_proposal_rejects_degenerate_combos(setup):
    """N_FINE=0 would silently train only the proposal net; COMPAT_SORT
    cannot be honored by the standalone fine composite — both must raise."""
    table, k_inv = setup
    state = trainlib.init_state(_cfg())
    rows = jnp.asarray([1.0]); cols = jnp.asarray([1.0])
    pose = jnp.asarray(np.asarray(table.poses)[:1])
    with pytest.raises(ValueError, match="N_FINE=0"):
        render.render_rays(state.params["net"], rows, cols, pose, k_inv,
                           4, 0, prop_params=state.params["prop"])
    with pytest.raises(ValueError, match="COMPAT_SORT"):
        render.render_rays(state.params["net"], rows, cols, pose, k_inv,
                           4, 4, prop_params=state.params["prop"],
                           compat_sort=True)


def test_bf16_fields_encode_at_f32():
    """The bf16 compute paths must positional-encode at f32: quantizing the
    raw coordinates to bf16 turns the top PE bands into phase noise."""
    import jax.numpy as jnp2
    cfg = Config(precision="bf16", use_pallas=False, proposal=True,
                 prop_field="mlp")  # this test checks the PE-net path
    field = trainlib.make_field_fn(cfg)
    prop_field = trainlib.make_prop_field_fn(cfg)
    from tinynerf.core import mlp
    net = mlp.init_network(jax.random.PRNGKey(0))
    prop = proposal.init_proposal(jax.random.PRNGKey(1))
    pts = jnp2.asarray([[1.37291, -0.84133, 0.42977]])
    dirs = jnp2.asarray([[0.0, 0.0, 1.0]])
    # f32 reference
    c32, s32 = render.field_jnp(net, pts, dirs)
    cb, sb = field(net, pts, dirs)
    # bf16 NETWORK error is ~1e-2 relative; bf16 COORDINATES before the
    # encoding would decorrelate outputs entirely (phase error >> 2*pi)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(c32), atol=0.05)
    cp32, sp32 = proposal.field_proposal(prop, pts, dirs)
    cpb, spb = prop_field(prop, pts, dirs)
    np.testing.assert_allclose(np.asarray(cpb), np.asarray(cp32), atol=0.05)


def test_proposal_narrow_encoding(setup):
    """PROPOSAL_ENC_L < 10: the proposal field runs on a truncated PE bank
    (placement-only job); params size follows, training runs and learns,
    and the default enc_l=10 path is unchanged."""
    p6 = proposal.init_proposal(jax.random.PRNGKey(0), enc_l=6)
    assert p6["trunk_0"]["w"].shape[0] == 3 * 2 * 6
    # default factory == field_proposal bit-for-bit
    pts = jnp.asarray([[0.3, -0.7, 1.1]]); dirs = jnp.asarray([[0., 0., 1.]])
    p10 = proposal.init_proposal(jax.random.PRNGKey(0))
    c_a, s_a = proposal.field_proposal(p10, pts, dirs)
    c_b, s_b = proposal.make_field_proposal()(p10, pts, dirs)
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_b))
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))

    table, k_inv = setup
    cfg = _cfg(proposal_enc_l=6, prop_field="mlp")  # PE-net-specific knob
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    assert state.params["prop"]["trunk_0"]["w"].shape[0] == 36
    first = last = None
    for _ in range(20):
        state, m = step(state)
        last = float(m["loss"])
        first = last if first is None else first
    assert np.isfinite(last) and last < first


def test_proposal_composes_with_occ_grid(setup):
    """PROPOSAL + OCC_GRID: the grid (built from the MAIN field) tightens
    bounds for both passes; the step must run and stay finite."""
    table, k_inv = setup
    cfg = _cfg(occ_grid=True, occ_res=8, occ_extent=6.0, occ_update_every=1,
               white_bkgd=True)
    step = trainlib.make_train_step(cfg, table, k_inv)
    state = trainlib.init_state(cfg)
    for _ in range(3):
        state, m = step(state)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(np.asarray(state.occ.raw)).any()


def test_proposal_sharded_step_on_mesh(setup):
    table, k_inv = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake devices")
    from tinynerf.parallel import mesh as meshlib
    cfg = _cfg(batch_ray=32)
    mesh = meshlib.make_mesh(8)
    step = trainlib.make_train_step(
        cfg, table, k_inv, batch_sharding=meshlib.batch_sharding(mesh))
    state = meshlib.replicate_state(trainlib.init_state(cfg), mesh)
    state, m = step(state)
    assert np.isfinite(float(m["loss"]))
