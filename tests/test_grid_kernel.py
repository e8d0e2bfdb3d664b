"""Fused CP-grid-field Pallas kernel vs the pure-jnp grid field
(core/gridfield.py), interpreter mode on CPU (compiled Mosaic exercised on
TPU by bench with GRID_PALLAS)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tinynerf.kernels.mlp_kernel as mk
import tinynerf.kernels.grid_kernel as gk
from tinynerf.core import gridfield


@pytest.fixture(scope="module", autouse=True)
def interpret_mode():
    prev = mk.INTERPRET
    mk.INTERPRET = True
    yield
    mk.INTERPRET = prev


ND = 8  # density components (small for interpreter speed)


@pytest.fixture(scope="module")
def data():
    """Dyadic (1/16-quantized) coordinates, same rationale as
    tests/test_pallas_kernel.py ``ray_data``: the in-kernel ``o + t*d``
    expansion rounds identically to XLA's staged version. Points span both
    in-grid and clipped (out-of-extent) regions so the clip VJP mask is
    exercised."""
    params = gridfield.init_grid_field(jax.random.PRNGKey(0), res=32,
                                       n_density=ND, n_app=16,
                                       decoder_width=32, extent=1.5)
    rng = np.random.default_rng(0)
    B, N = 20, 9  # deliberately not tile multiples -> tests padding
    q = lambda x: np.round(x * 16.0) / 16.0
    o = jnp.asarray(q(rng.uniform(-0.9, 0.9, (B, 3))).astype(np.float32))
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(q(d / np.linalg.norm(d, axis=-1, keepdims=True))
                    .astype(np.float32))
    ts = jnp.asarray(np.sort(q(rng.uniform(0.1, 2.9, (B, N))), axis=1)
                     .astype(np.float32))
    return params, o, d, ts


def _jnp_ray_eval(params, o, d, ts, nd=ND, dtype=jnp.float32):
    pts = o[:, None, :] + ts[..., None] * d[:, None, :]
    dirs_b = jnp.broadcast_to(d[:, None, :], pts.shape)
    color_c, sigma = gridfield.apply_grid_field(params, pts, dirs_b,
                                                n_density=nd,
                                                compute_dtype=dtype)
    return color_c, jnp.squeeze(sigma, -1)


def test_ray_forward_matches_jnp(data):
    params, o, d, ts = data
    c_ref, s_ref = _jnp_ray_eval(params, o, d, ts)
    (r, g, b), sigma = gk.grid_field_pallas_rays(
        params, o, d, ts, n_density=ND, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(s_ref),
                               atol=1e-5)
    for plane, ref in zip((r, g, b), c_ref):
        np.testing.assert_allclose(np.asarray(plane), np.asarray(ref),
                                   atol=1e-5)


def test_ray_vjp_matches_autodiff(data):
    params, o, d, ts = data

    def loss_k(params, o, d, ts):
        (r, g, b), sigma = gk.grid_field_pallas_rays(
            params, o, d, ts, n_density=ND, compute_dtype=jnp.float32)
        return (jnp.sum(jnp.sin(r + 2 * g + 3 * b))
                + jnp.sum(jnp.cos(sigma * 0.1)))

    def loss_ref(params, o, d, ts):
        (r, g, b), s = _jnp_ray_eval(params, o, d, ts)
        return (jnp.sum(jnp.sin(r + 2 * g + 3 * b))
                + jnp.sum(jnp.cos(s * 0.1)))

    gk_ = jax.grad(loss_k, argnums=(0, 1, 2, 3))(params, o, d, ts)
    gr_ = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, o, d, ts)
    for a, b_ in zip(jax.tree_util.tree_leaves(gk_),
                     jax.tree_util.tree_leaves(gr_)):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = np.max(np.abs(b_)) + 1e-8  # scale-normalized
        np.testing.assert_allclose(a / scale, b_ / scale, atol=2e-5)


def test_prod_shape_variant(data):
    """Kernel is generic in (res, n_density, n_app, width) — run it at the
    production table geometry (R=256, 32+48, width 64)."""
    params = gridfield.init_grid_field(jax.random.PRNGKey(1))
    _p, o, d, ts = data
    c_ref, s_ref = _jnp_ray_eval(params, o, d, ts,
                                 nd=gridfield.N_COMP_DENSITY)
    (r, _g, _b), sigma = gk.grid_field_pallas_rays(
        params, o, d, ts, n_density=gridfield.N_COMP_DENSITY,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(s_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(r), np.asarray(c_ref[0]),
                               atol=1e-5)


def test_bf16_forward_close(data):
    """bf16 compute stays close to the f32 field (coords stay f32 inside
    the kernel — only table/decoder matmuls quantize)."""
    params, o, d, ts = data
    c_ref, s_ref = _jnp_ray_eval(params, o, d, ts)
    (r, g, b), sigma = gk.grid_field_pallas_rays(
        params, o, d, ts, n_density=ND, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(s_ref),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(r), np.asarray(c_ref[0]),
                               atol=0.05)


def test_train_loss_grads_with_kernel():
    """GRID_PALLAS wiring end-to-end: make_loss_fn gradients through the
    kernelized grid fine field + grid proposal match the jnp grid path."""
    from tinynerf import train as trainlib
    from tinynerf.config import Config
    from tinynerf.core.rays import make_k_inv
    from tinynerf.data.rays import RayBatch

    B, hw = 8, 16.0
    kw = dict(batch_ray=B, n_coarse=4, n_fine=6, stratified=False,
              fine_field="grid", grid_res=16, grid_comp_density=4,
              grid_comp_app=8, grid_decoder_width=16,
              proposal=True, prop_field="grid", prop_grid_res=8,
              prop_grid_comp_density=4, prop_grid_comp_app=4,
              prop_grid_decoder_width=8, use_pallas=False)
    cfg_j = Config(**kw)
    cfg_k = Config(**dict(kw, grid_pallas=True))
    params = trainlib.init_state(cfg_j, jax.random.PRNGKey(3)).params

    rng = np.random.default_rng(5)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.1, -0.2, 2.0]
    hwf = np.array([[hw], [hw], [19.2]], np.float32)
    p17 = jnp.asarray(np.tile(np.concatenate(
        [np.concatenate([c2w[:3, :4], hwf], 1).flatten(), [0.5, 3.5]]),
        (B, 1)).astype(np.float32))
    batch = RayBatch(
        rows=jnp.asarray(rng.uniform(0, hw, B).astype(np.float32)),
        cols=jnp.asarray(rng.uniform(0, hw, B).astype(np.float32)),
        rgb=jnp.asarray(rng.uniform(0, 1, (B, 3)).astype(np.float32)),
        pose17=p17, pic=jnp.zeros((B,), jnp.int32))
    k_inv = make_k_inv(hw, hw, 19.2)

    def run(cfg, force):
        ffn = trainlib.make_field_fn(cfg, force_pallas=force)
        if force:
            assert getattr(ffn, "eval_rays", None) is not None
        loss_fn = trainlib.make_loss_fn(cfg, k_inv, ffn)
        key = jax.random.PRNGKey(0)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        return float(loss), grads

    # NOTE: the proposal field inside make_loss_fn is built by
    # make_prop_field_fn(cfg) (no force_pallas), so on the CPU test backend
    # the prop side runs jnp in both runs; the kernelized prop path itself
    # is covered by test_render_rays_with_grid_kernel's eval_rays route.
    l_j, g_j = run(cfg_j, False)
    l_k, g_k = run(cfg_k, True)
    np.testing.assert_allclose(l_k, l_j, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_j)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(b)) + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-5)


def test_render_rays_with_grid_kernel(data):
    """Full hierarchical render with the kernelized grid field (coarse AND
    fine pass through eval_rays) matches the jnp grid path."""
    from tests.test_rays import _pose17
    from tinynerf.core import render
    from tinynerf.core.rays import make_k_inv

    params, *_ = data
    k_inv = make_k_inv(8.0, 8.0, 10.0)
    pose = jnp.asarray(np.tile(_pose17(np.eye(4), 8, 8, 10.0, 0.5, 2.5),
                               (4, 1)))
    rows = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    cols = jnp.asarray([4.0, 3.0, 2.0, 1.0])

    jfn = gridfield.make_field_grid(n_density=ND)
    kfn = gridfield.make_field_grid(n_density=ND)
    kfn.eval_rays = functools.partial(gk.grid_field_pallas_rays,
                                      n_density=ND,
                                      compute_dtype=jnp.float32)
    c_k = render.render_rays(params, rows, cols, pose, k_inv, 8, 8,
                             field_fn=kfn)
    c_j = render.render_rays(params, rows, cols, pose, k_inv, 8, 8,
                             field_fn=jfn)
    np.testing.assert_allclose(np.asarray(c_k[0]), np.asarray(c_j[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_k[1]), np.asarray(c_j[1]),
                               atol=1e-5)
