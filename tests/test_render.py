import numpy as np
import jax
import jax.numpy as jnp

from tinynerf.core import mlp, render
from tests.test_rays import _pose17
from tinynerf.core.rays import make_k_inv


def test_get_density_hand_computed():
    # inclusive-cumsum transmittance (Q5): w_i = exp(-sum_{j<=i} s_j d_j)
    #                                          * (1 - exp(-s_i d_i))
    delta = jnp.array([[1.0, 1.0, 1.0]])
    sigma = jnp.array([[0.5, 1.0, 2.0]])
    w = np.asarray(render.get_density(delta, sigma))
    sd = np.array([0.5, 1.0, 2.0])
    csum = np.cumsum(sd)
    expected = np.exp(-csum) * (1 - np.exp(-sd))
    np.testing.assert_allclose(w[0], expected, rtol=1e-6)


def test_get_density_differs_from_exclusive():
    # sanity: the reference variant is NOT the standard exclusive form
    delta = jnp.ones((1, 4))
    sigma = jnp.ones((1, 4))
    w = np.asarray(render.get_density(delta, sigma))
    exclusive = np.exp(-np.concatenate([[0], np.cumsum(np.ones(3))])) \
        * (1 - np.exp(-1))
    assert not np.allclose(w[0], exclusive)


def test_composite():
    w = jnp.array([[0.25, 0.75]])
    rgb = jnp.array([[[1.0, 0.0, 0.5], [0.0, 1.0, 0.5]]])
    out = np.asarray(render.composite(w, rgb))
    np.testing.assert_allclose(out[0], [0.25, 0.75, 0.5])


def _tiny_setup(batch=6, seed=0):
    params = mlp.init_network(jax.random.PRNGKey(seed))
    h = w = 8.0
    f = 10.0
    from tinynerf.core.rays import make_k_inv
    k_inv = make_k_inv(h, w, f)
    pose = _pose17(np.eye(4), h, w, f, 2.0, 6.0)
    rng = np.random.default_rng(seed)
    rows = jnp.asarray(rng.uniform(0, h, batch).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, w, batch).astype(np.float32))
    pose17 = jnp.broadcast_to(jnp.asarray(pose), (batch, 17))
    return params, rows, cols, pose17, k_inv


def test_render_rays_shapes_and_finite():
    params, rows, cols, pose17, k_inv = _tiny_setup()
    c_co, c_fi = render.render_rays(params, rows, cols, pose17, k_inv,
                                    n_coarse=8, n_fine=16)
    assert c_co.shape == (6, 3) and c_fi.shape == (6, 3)
    assert np.all(np.isfinite(np.asarray(c_co)))
    assert np.all(np.isfinite(np.asarray(c_fi)))
    # composited color of sigmoid outputs stays in [0, ~1]
    assert np.asarray(c_fi).max() <= 1.0 + 1e-5


def test_render_rays_coarse_only():
    params, rows, cols, pose17, k_inv = _tiny_setup()
    c_co, c_fi = render.render_rays(params, rows, cols, pose17, k_inv,
                                    n_coarse=8, n_fine=0)
    np.testing.assert_array_equal(np.asarray(c_co), np.asarray(c_fi))


def test_render_rays_jittable_and_grad():
    params, rows, cols, pose17, k_inv = _tiny_setup()
    target = jnp.full((6, 3), 0.5)

    @jax.jit
    def loss_fn(p):
        c_co, c_fi = render.render_rays(p, rows, cols, pose17, k_inv, 8, 16)
        return render.ray_loss(c_co, c_fi, target)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in flat) > 0


def test_ray_loss_is_sum_not_mean():
    c = jnp.ones((4, 3))
    t = jnp.zeros((4, 3))
    # both passes: 2 * (4*3 * 1^2) = 24
    assert float(render.ray_loss(c, c, t)) == 24.0


def test_merged_composite_equals_sorted_reference():
    """The sort-free merged compositing must equal the explicit
    sort -> diff -> density -> composite formulation, including ties."""
    from tinynerf.core import sampling
    rng = np.random.default_rng(0)
    B, NC, NF = 5, 16, 24
    t_co = np.sort(rng.uniform(2, 6, (B, NC)).astype(np.float32), axis=1)
    t_fi = np.sort(rng.uniform(2, 6, (B, NF)).astype(np.float32), axis=1)
    # cross-list tie that PRESERVES per-list sortedness (the pipeline's
    # invariant): snap a fine sample to the nearest coarse value inside its
    # neighbor window
    j = np.searchsorted(t_co[0], t_fi[0, 3])
    if j < NC and t_co[0, j] <= t_fi[0, 4]:
        t_fi[0, 3] = t_co[0, j]
    else:
        t_co[0, j - 1] = t_fi[0, 3]
    t_co[1, 5] = t_co[1, 6]   # within-list tie
    assert np.all(np.diff(t_co, axis=1) >= 0)
    assert np.all(np.diff(t_fi, axis=1) >= 0)
    sigma_co = rng.uniform(0, 3, (B, NC)).astype(np.float32)
    sigma_fi = rng.uniform(0, 3, (B, NF)).astype(np.float32)
    color_co = rng.uniform(0, 1, (B, NC, 3)).astype(np.float32)
    color_fi = rng.uniform(0, 1, (B, NF, 3)).astype(np.float32)

    got = np.asarray(render.merged_composite(
        jnp.asarray(t_co), jnp.asarray(t_fi), jnp.asarray(sigma_co),
        jnp.asarray(sigma_fi), jnp.asarray(color_co), jnp.asarray(color_fi)))

    # oracle: stable sort of the concatenation, then the sorted pipeline
    t_all = np.concatenate([t_co, t_fi], axis=1)
    sig = np.concatenate([sigma_co, sigma_fi], axis=1)
    col = np.concatenate([color_co, color_fi], axis=1)
    order = np.argsort(t_all, axis=1, kind="stable")
    t_s = np.take_along_axis(t_all, order, axis=1)
    sig_s = np.take_along_axis(sig, order, axis=1)
    col_s = np.take_along_axis(col, order[..., None], axis=1)
    delta = np.concatenate([np.diff(t_s, axis=1),
                            np.full((B, 1), render.TAIL_DELTA)], axis=1)
    sd = delta * sig_s
    w = np.exp(-np.cumsum(sd, axis=1)) * (1 - np.exp(-sd))
    want = np.sum(w[..., None] * col_s, axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_merged_composite_grads_match_sorted_path():
    from tinynerf.core import sampling
    rng = np.random.default_rng(1)
    B, NC, NF = 3, 8, 12
    t_co = jnp.asarray(np.sort(rng.uniform(2, 6, (B, NC)), axis=1),
                       jnp.float32)
    t_fi0 = np.sort(rng.uniform(2, 6, (B, NF)), axis=1).astype(np.float32)
    sigma_co = jnp.asarray(rng.uniform(0, 2, (B, NC)), jnp.float32)
    sigma_fi = jnp.asarray(rng.uniform(0, 2, (B, NF)), jnp.float32)
    color_co = jnp.asarray(rng.uniform(0, 1, (B, NC, 3)), jnp.float32)
    color_fi = jnp.asarray(rng.uniform(0, 1, (B, NF, 3)), jnp.float32)

    def loss_new(t_fi, s_fi):
        return jnp.sum(render.merged_composite(
            t_co, t_fi, sigma_co, s_fi, color_co, color_fi))

    def loss_old(t_fi, s_fi):
        t_cat, ranks = sampling.merge_sorted_ts(t_co, t_fi)
        col = jnp.concatenate([color_co, color_fi], axis=1)
        sig = jnp.concatenate([sigma_co, s_fi], axis=1)
        bundle = jnp.concatenate([t_cat[..., None], col, sig[..., None]],
                                 axis=-1)
        b = sampling.apply_ranks(ranks, bundle)
        t_s, col_s, sig_s = b[..., 0], b[..., 1:4], b[..., 4]
        delta = jnp.concatenate(
            [t_s[:, 1:] - t_s[:, :-1],
             jnp.full_like(t_s[:, :1], render.TAIL_DELTA)], axis=1)
        return jnp.sum(render.composite(render.get_density(delta, sig_s),
                                        col_s))

    args = (jnp.asarray(t_fi0), sigma_fi)
    g_new = jax.grad(loss_new, argnums=(0, 1))(*args)
    g_old = jax.grad(loss_old, argnums=(0, 1))(*args)
    for a, b in zip(g_new, g_old):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_white_bkgd_term():
    """Empty rays (sigma ~ 0) composite to white with white_bkgd=True and to
    black without — and both merge implementations agree."""
    params, rows, cols, pose17, k_inv = _tiny_setup()
    # zero out the sigma head so all density ~ |bias|
    params = dict(params)
    params["sigma"] = {"w": jnp.zeros_like(params["sigma"]["w"]),
                      "b": jnp.zeros_like(params["sigma"]["b"])}
    _, black = render.render_rays(params, rows, cols, pose17, k_inv, 4, 4,
                                  white_bkgd=False)
    _, white_p = render.render_rays(params, rows, cols, pose17, k_inv, 4, 4,
                                    white_bkgd=True, merge_impl="permute")
    _, white_t = render.render_rays(params, rows, cols, pose17, k_inv, 4, 4,
                                    white_bkgd=True, merge_impl="twolist")
    np.testing.assert_allclose(np.asarray(black), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(white_p), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(white_t), np.asarray(white_p),
                               atol=1e-5)


def test_compat_sort_flag_changes_result():
    params, rows, cols, pose17, k_inv = _tiny_setup()
    _, fixed = render.render_rays(params, rows, cols, pose17, k_inv, 8, 16,
                                  compat_sort=False)
    _, compat = render.render_rays(params, rows, cols, pose17, k_inv, 8, 16,
                                   compat_sort=True)
    # the reference's independent-channel sort (Q4) gives a different render
    assert not np.allclose(np.asarray(fixed), np.asarray(compat))


def test_depth_and_acc_extras():
    """extras=True returns expected-termination depth + accumulated opacity:
    an opaque analytic sphere at the origin seen from z=+4 terminates rays
    near its front surface (t ~ 3.5); miss rays accumulate ~0 opacity."""
    from tests.test_rays import _pose17

    def field(params, points, dirs):
        dist = jnp.linalg.norm(points, axis=-1, keepdims=True)
        sigma = jnp.where(dist < 0.5, 50.0, 0.0)
        return jnp.ones(points.shape[:-1] + (3,)), sigma

    hw, f = 9.0, 12.0
    k_inv = make_k_inv(hw, hw, f)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.0, 0.0, 4.0]         # camera at z=+4 looking down -z
    pose = jnp.asarray(np.tile(_pose17(c2w, hw, hw, f, 2.0, 6.0), (2, 1)))
    # the (4.5, 4.5) pixel ray passes through the origin; (0, 0) misses
    rows = jnp.asarray(np.array([4.5, 0.0], np.float32))
    cols = jnp.asarray(np.array([4.5, 0.0], np.float32))
    out = render.render_rays(None, rows, cols, pose, k_inv, 32, 64,
                             field_fn=field, extras=True)
    assert len(out) == 4
    _, c_fi, depth, acc = out
    # hit: opaque (Q5's INCLUSIVE cumsum discounts each sample by its own
    # opacity, so acc saturates below 1 at finite sample counts)
    assert float(acc[0]) > 0.75
    assert 3.3 < float(depth[0]) < 3.8   # camera z=4, sphere front at 3.5
    assert float(acc[1]) < 0.05          # miss: transparent


def test_frame_fn_extras_shapes(tmp_path):
    from tinynerf.config import Config
    from tinynerf import eval as evallib
    from tinynerf.core import mlp

    params = mlp.init_network(jax.random.PRNGKey(0))
    cfg = Config(n_coarse=4, n_fine=8, use_pallas=False, render_chunk=32)
    k_inv = make_k_inv(8.0, 8.0, 10.0)
    frame_fn = evallib.make_frame_fn(cfg, k_inv, 8, 8, extras=True)
    from tests.test_rays import _pose17
    p17 = jnp.asarray(_pose17(np.eye(4), 8, 8, 10.0, 2.0, 6.0))
    rgb, depth, acc = frame_fn(params, p17)
    assert rgb.shape == (8, 8, 3) and depth.shape == (8, 8)
    assert acc.shape == (8, 8)
    assert np.isfinite(np.asarray(depth)).all()


def test_distortion_loss_matches_bruteforce():
    """O(N)-memory prefix-sum form == the naive pairwise double sum."""
    rng = np.random.default_rng(11)
    B, N = 5, 17
    near = rng.uniform(1.0, 2.0, B).astype(np.float32)
    far = near + rng.uniform(2.0, 4.0, B).astype(np.float32)
    t = np.sort(rng.uniform(near[:, None], far[:, None],
                            (B, N)), axis=1).astype(np.float32)
    w = rng.uniform(0.0, 0.1, (B, N)).astype(np.float32)

    got = np.asarray(render.distortion_loss(
        jnp.asarray(t), jnp.asarray(w), jnp.asarray(near), jnp.asarray(far)))

    s = (t - near[:, None]) / (far - near)[:, None]
    pairwise = np.einsum("bi,bj,bij->b", w, w,
                         np.abs(s[:, :, None] - s[:, None, :]))
    ds = np.concatenate([s[:, 1:] - s[:, :-1], np.zeros((B, 1))], axis=1)
    expected = pairwise + np.sum(w * w * ds, axis=1) / 3.0
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-6)


def test_distortion_loss_prefers_concentrated_weight():
    """The regularizer's entire point: a delta-like weight distribution
    scores (much) lower than the same mass spread along the ray."""
    N = 64
    t = jnp.linspace(2.0, 6.0, N)[None]
    near, far = jnp.array([2.0]), jnp.array([6.0])
    spread = jnp.full((1, N), 1.0 / N)
    concentrated = jnp.zeros((1, N)).at[0, N // 2].set(1.0)
    l_spread = float(render.distortion_loss(t, spread, near, far)[0])
    l_conc = float(render.distortion_loss(t, concentrated, near, far)[0])
    assert l_conc < 0.05 * l_spread


def test_dist_loss_training_wiring():
    """DIST_LOSS>0 + PROPOSAL: loss is finite, differs from the
    unregularized loss, grads flow; without PROPOSAL it refuses."""
    import pytest
    from tinynerf import train as trainlib
    from tinynerf.config import Config
    from tinynerf.data.rays import RayBatch

    kw = dict(batch_ray=8, n_coarse=8, n_fine=8, use_pallas=False,
              proposal=True, prop_field="grid", prop_grid_res=8,
              prop_grid_comp_density=4, prop_grid_comp_app=4,
              prop_grid_decoder_width=8)
    cfg0 = Config(**kw)
    cfg1 = Config(**kw, dist_loss=0.01)
    k_inv = make_k_inv(12.0, 12.0, 14.0)
    rng = np.random.default_rng(3)
    batch = RayBatch(
        rows=jnp.asarray(rng.uniform(0, 11, 8).astype(np.float32)),
        cols=jnp.asarray(rng.uniform(0, 11, 8).astype(np.float32)),
        pose17=jnp.asarray(np.tile(
            np.asarray(_pose17(np.eye(4), 12, 12, 14.0, 2.0, 6.0)), (8, 1))),
        rgb=jnp.asarray(rng.uniform(0, 1, (8, 3)).astype(np.float32)),
        pic=jnp.zeros((8,), jnp.int32))
    params = trainlib.init_state(cfg1).params

    loss0 = trainlib.make_loss_fn(cfg0, k_inv)
    loss1 = trainlib.make_loss_fn(cfg1, k_inv)
    key = jax.random.PRNGKey(0)
    l0 = float(loss0(params, batch, key)[0])
    (l1, _aux), grads = jax.value_and_grad(
        loss1, has_aux=True)(params, batch, key)
    assert np.isfinite(l0) and np.isfinite(float(l1))
    assert float(l1) > l0  # the penalty is nonnegative and nonzero at init
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)

    with pytest.raises(ValueError, match="PROPOSAL"):
        trainlib.make_loss_fn(Config(batch_ray=8, n_coarse=8, n_fine=8,
                                     use_pallas=False, dist_loss=0.01),
                              k_inv)


def test_interlevel_loss_matches_bruteforce():
    """(B, N_f, N_c)-mask matmul form == a naive python-loop overlap sum."""
    rng = np.random.default_rng(5)
    B, Nc, Nf = 3, 6, 9
    t_p = np.sort(rng.uniform(2, 6, (B, Nc)), axis=1).astype(np.float32)
    t_f = np.sort(rng.uniform(2, 6, (B, Nf)), axis=1).astype(np.float32)
    w_p = rng.uniform(0, 0.2, (B, Nc)).astype(np.float32)
    w_f = rng.uniform(0, 0.2, (B, Nf)).astype(np.float32)

    got = np.asarray(render.interlevel_loss(
        jnp.asarray(t_p), jnp.asarray(w_p),
        jnp.asarray(t_f), jnp.asarray(w_f)))

    tail = render.TAIL_DELTA
    expected = np.zeros(B)
    for b in range(B):
        p_lo, p_hi = t_p[b], np.append(t_p[b][1:], t_p[b][-1] + tail)
        f_lo, f_hi = t_f[b], np.append(t_f[b][1:], t_f[b][-1] + tail)
        for i in range(Nf):
            outer = sum(w_p[b, j] for j in range(Nc)
                        if p_hi[j] > f_lo[i] and p_lo[j] < f_hi[i])
            excess = max(0.0, w_f[b, i] - outer)
            expected[b] += excess ** 2 / (w_f[b, i] + 1e-7)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-7)


def test_interlevel_loss_zero_when_prop_covers():
    """A proposal histogram that everywhere dominates the fine weights
    incurs zero loss (the penalty is one-sided), and gradients NEVER flow
    into the fine weights (the paper's stop-gradient asymmetry)."""
    B, N = 2, 8
    t = jnp.tile(jnp.linspace(2.0, 6.0, N)[None], (B, 1))
    w_f = jnp.full((B, N), 0.05)
    w_p = jnp.full((B, N), 0.5)  # dominates every overlap sum
    loss = render.interlevel_loss(t, w_p, t, w_f)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-8)

    # under-coverage -> positive, d/dw_p nonzero, d/dw_f identically zero
    w_p_low = jnp.zeros((B, N))
    total = lambda wp, wf: jnp.sum(render.interlevel_loss(t, wp, t, wf))
    assert float(total(w_p_low, w_f)) > 0
    g_p = jax.grad(total, argnums=0)(w_p_low, w_f)
    g_f = jax.grad(total, argnums=1)(w_p_low, w_f)
    assert float(jnp.sum(jnp.abs(g_p))) > 0
    np.testing.assert_allclose(np.asarray(g_f), 0.0)


def test_interlevel_training_wiring():
    """PROP_INTERLEVEL>0: loss finite and >= the unregularized loss; grads
    reach the proposal leaves; refuses without PROPOSAL."""
    import pytest
    from tinynerf import train as trainlib
    from tinynerf.config import Config
    from tinynerf.data.rays import RayBatch

    kw = dict(batch_ray=8, n_coarse=8, n_fine=8, use_pallas=False,
              proposal=True, prop_field="grid", prop_grid_res=8,
              prop_grid_comp_density=4, prop_grid_comp_app=4,
              prop_grid_decoder_width=8)
    cfg = Config(**kw, prop_interlevel=1.0)
    k_inv = make_k_inv(12.0, 12.0, 14.0)
    rng = np.random.default_rng(4)
    batch = RayBatch(
        rows=jnp.asarray(rng.uniform(0, 11, 8).astype(np.float32)),
        cols=jnp.asarray(rng.uniform(0, 11, 8).astype(np.float32)),
        pose17=jnp.asarray(np.tile(
            np.asarray(_pose17(np.eye(4), 12, 12, 14.0, 2.0, 6.0)), (8, 1))),
        rgb=jnp.asarray(rng.uniform(0, 1, (8, 3)).astype(np.float32)),
        pic=jnp.zeros((8,), jnp.int32))
    params = trainlib.init_state(cfg).params
    key = jax.random.PRNGKey(0)

    l_plain = float(trainlib.make_loss_fn(
        Config(**kw), k_inv)(params, batch, key)[0])
    (l_il, _), grads = jax.value_and_grad(
        trainlib.make_loss_fn(cfg, k_inv), has_aux=True)(params, batch, key)
    assert np.isfinite(float(l_il)) and float(l_il) >= l_plain
    g_prop = jax.tree_util.tree_leaves(grads["prop"])
    assert all(np.all(np.isfinite(np.asarray(g))) for g in g_prop)

    with pytest.raises(ValueError, match="PROPOSAL"):
        trainlib.make_loss_fn(Config(batch_ray=8, n_coarse=8, n_fine=8,
                                     use_pallas=False, prop_interlevel=1.0),
                              k_inv)
