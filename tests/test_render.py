import numpy as np
import jax
import jax.numpy as jnp

from tinynerf.core import mlp, render
from tests.test_rays import _pose17


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


def test_compat_sort_flag_changes_result():
    params, rows, cols, pose17, k_inv = _tiny_setup()
    _, fixed = render.render_rays(params, rows, cols, pose17, k_inv, 8, 16,
                                  compat_sort=False)
    _, compat = render.render_rays(params, rows, cols, pose17, k_inv, 8, 16,
                                   compat_sort=True)
    # the reference's independent-channel sort (Q4) gives a different render
    assert not np.allclose(np.asarray(fixed), np.asarray(compat))
