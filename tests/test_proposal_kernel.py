"""Fused proposal-field Pallas kernel vs the pure-jnp proposal field,
interpreter mode on CPU (compiled Mosaic exercised on TPU by bench
--proposal)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tinynerf.kernels.mlp_kernel as mk
import tinynerf.kernels.proposal_kernel as pk
from tinynerf.core import proposal


@pytest.fixture(scope="module", autouse=True)
def interpret_mode():
    prev = mk.INTERPRET
    mk.INTERPRET = True
    yield
    mk.INTERPRET = prev


@pytest.fixture(scope="module")
def data():
    """Dyadic (1/16-quantized) coordinates, same rationale as
    tests/test_pallas_kernel.py ``ray_data``: the in-kernel ``o + t*d``
    expansion then rounds identically to XLA's staged version, isolating
    kernel math from 1-ulp divergence that PE args ~2^10*pi*|x| amplify."""
    params = proposal.init_proposal(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, N = 20, 9  # deliberately not tile multiples -> tests padding
    q = lambda x: np.round(x * 16.0) / 16.0
    o = jnp.asarray(q(rng.uniform(-2, 2, (B, 3))).astype(np.float32))
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(q(d / np.linalg.norm(d, axis=-1, keepdims=True))
                    .astype(np.float32))
    ts = jnp.asarray(np.sort(q(rng.uniform(2.0, 6.0, (B, N))), axis=1)
                     .astype(np.float32))
    return params, o, d, ts


def _jnp_ray_eval(params, o, d, ts):
    pts = o[:, None, :] + ts[..., None] * d[:, None, :]
    dirs_b = jnp.broadcast_to(d[:, None, :], pts.shape)
    color, sigma = proposal.field_proposal(params, pts, dirs_b)
    return color, jnp.squeeze(sigma, -1)


def test_ray_forward_matches_jnp(data):
    params, o, d, ts = data
    c_ref, s_ref = _jnp_ray_eval(params, o, d, ts)
    (r, g, b), sigma = pk.prop_field_pallas_rays(
        params, o, d, ts, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(s_ref),
                               atol=1e-5)
    for c, plane in enumerate((r, g, b)):
        np.testing.assert_allclose(np.asarray(plane),
                                   np.asarray(c_ref[..., c]), atol=1e-5)


def test_flat_forward_matches_jnp(data):
    params, o, d, _ts = data
    c_ref, s_ref = proposal.field_proposal(params, o, d)
    c_k, s_k = pk.prop_field_pallas(params, o, d, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), atol=1e-5)


def test_ray_vjp_matches_autodiff(data):
    params, o, d, ts = data

    def loss_k(params, o, d, ts):
        (r, g, b), sigma = pk.prop_field_pallas_rays(
            params, o, d, ts, compute_dtype=jnp.float32)
        return (jnp.sum(jnp.sin(r + 2 * g + 3 * b))
                + jnp.sum(jnp.cos(sigma * 0.1)))

    def loss_ref(params, o, d, ts):
        c, s = _jnp_ray_eval(params, o, d, ts)
        return (jnp.sum(jnp.sin(c[..., 0] + 2 * c[..., 1] + 3 * c[..., 2]))
                + jnp.sum(jnp.cos(s * 0.1)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(params, o, d, ts)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, o, d, ts)
    for a, b_ in zip(jax.tree_util.tree_leaves(gk),
                     jax.tree_util.tree_leaves(gr)):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = np.max(np.abs(b_)) + 1e-8  # scale-normalized, like
        np.testing.assert_allclose(a / scale, b_ / scale, atol=2e-5)


def test_depth3_width64_variant(data):
    """Kernel is depth/width-generic (PROPOSAL_WIDTH/DEPTH configs)."""
    params = proposal.init_proposal(jax.random.PRNGKey(1), width=64, depth=3)
    _p, o, d, ts = data
    c_ref, s_ref = _jnp_ray_eval(params, o, d, ts)
    (r, g, b), sigma = pk.prop_field_pallas_rays(
        params, o, d, ts, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(s_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(c_ref[..., 0]),
                               atol=1e-5)


def test_render_rays_with_pallas_prop(data):
    """Full hierarchical render with the kernelized proposal coarse pass
    matches the jnp proposal path."""
    import functools
    from tests.test_rays import _pose17
    from tinynerf.core import mlp, render
    from tinynerf.core.rays import make_k_inv

    params, *_ = data
    net = mlp.init_network(jax.random.PRNGKey(2))
    k_inv = make_k_inv(8.0, 8.0, 10.0)
    pose = jnp.asarray(np.tile(_pose17(np.eye(4), 8, 8, 10.0, 2.0, 6.0),
                               (4, 1)))
    rows = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    cols = jnp.asarray([4.0, 3.0, 2.0, 1.0])

    kfn = functools.partial(pk.prop_field_pallas, compute_dtype=jnp.float32)
    kfn.eval_rays = functools.partial(pk.prop_field_pallas_rays,
                                      compute_dtype=jnp.float32)
    c_k = render.render_rays(net, rows, cols, pose, k_inv, 8, 8,
                             prop_params=params, prop_field_fn=kfn)
    c_j = render.render_rays(net, rows, cols, pose, k_inv, 8, 8,
                             prop_params=params,
                             prop_field_fn=proposal.field_proposal)
    np.testing.assert_allclose(np.asarray(c_k[0]), np.asarray(c_j[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_k[1]), np.asarray(c_j[1]),
                               atol=1e-5)
