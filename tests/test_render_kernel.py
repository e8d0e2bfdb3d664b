"""Fused renderer kernel vs the unfused render_rays twolist path, in
interpreter mode on CPU (compiled Mosaic is exercised on real TPU by bench.py
and the driver's entry checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tinynerf.kernels.mlp_kernel as mk
import tinynerf.kernels.render_kernel as rk
from tinynerf.core import mlp, render, sampling
from tinynerf.core.rays import make_k_inv, pixels_to_rays

NC, NF, B = 8, 16, 24


@pytest.fixture(scope="module", autouse=True)
def interpret_mode():
    prev = mk.INTERPRET
    mk.INTERPRET = True
    yield
    mk.INTERPRET = prev


@pytest.fixture(scope="module")
def rays():
    """A realistic ray bundle through pixels_to_rays (sorted t's, real
    geometry) plus params trained-ish enough for non-degenerate weights."""
    params = mlp.init_network(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    hw, f = 16.0, 19.2
    k_inv = make_k_inv(hw, hw, f)
    rows = jnp.asarray(rng.uniform(0, hw, B).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, hw, B).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.3, -0.2, 4.0]
    hwf = np.array([[hw], [hw], [f]], np.float32)
    p17 = np.tile(np.concatenate(
        [np.concatenate([c2w[:3, :4], hwf], 1).flatten(), [2.0, 6.0]]),
        (B, 1)).astype(np.float32)
    origins, dirs, near, far = pixels_to_rays(rows, cols, jnp.asarray(p17),
                                              k_inv)
    t_co = sampling.coarse_ts(near, far, NC)
    return params, origins, dirs, t_co, near, far


def _pallas_field():
    """The production field (Pallas MLP, f32): keeps the oracle's MLP
    bit-compatible with the fused kernel's, so the comparison isolates the
    tail math (t_fi perturbations at 1e-6 amplify to ~1e-4 in the output
    through the positional encoding's ~1e4-magnitude arguments)."""
    import functools
    fn = functools.partial(mk.field_pallas, compute_dtype=jnp.float32)
    fn.eval_rays = functools.partial(mk.field_pallas_rays,
                                     compute_dtype=jnp.float32)
    return fn


def _unfused(params, origins, dirs, t_co, near, far, white_bkgd=False):
    """render_rays' math (twolist merge) on precomputed rays — the oracle."""
    field_fn = _pallas_field()
    color_co, sigma_co = render._eval_field(field_fn, params,
                                            origins, dirs, t_co)
    delta_co = jnp.broadcast_to(((far - near) / NC)[:, None], t_co.shape)
    dense_co = render.get_density(delta_co, sigma_co)
    c_co = render.composite(dense_co, color_co)
    if white_bkgd:
        c_co = c_co + (1.0 - jnp.sum(dense_co, axis=1))[:, None]
    t_fi = sampling.resample(t_co, dense_co, (far - near) / (NC - 1), NF)
    color_fi, sigma_fi = render._eval_field(field_fn, params,
                                            origins, dirs, t_fi)
    c_fi = render.merged_composite(t_co, t_fi, sigma_co, sigma_fi,
                                   color_co, color_fi,
                                   white_bkgd=white_bkgd)
    return c_co, c_fi


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_forward_matches_unfused(rays, white_bkgd):
    params, origins, dirs, t_co, near, far = rays
    c_co_ref, c_fi_ref = _unfused(params, origins, dirs, t_co, near, far,
                                  white_bkgd)
    c_co, c_fi = rk.render_fused(params, origins, dirs, t_co, near, far,
                                 NF, white_bkgd=white_bkgd,
                                 compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(c_co), np.asarray(c_co_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_fi), np.asarray(c_fi_ref),
                               atol=2e-5)


def test_padding_partial_tile(rays):
    """B=24 is not a multiple of the ray tile — padded rays must not leak."""
    params, origins, dirs, t_co, near, far = rays
    full = rk.render_fused(params, origins, dirs, t_co, near, far, NF,
                           compute_dtype=jnp.float32)
    half = rk.render_fused(params, origins[:11], dirs[:11], t_co[:11],
                           near[:11], far[:11], NF,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(half[1]), np.asarray(full[1][:11]),
                               atol=1e-6)


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_gradients_match_autodiff(rays, white_bkgd):
    """Hand-derived backward (merge -> fine MLP -> resampler -> density ->
    coarse MLP) vs jax autodiff of the identical unfused math."""
    params, origins, dirs, t_co, near, far = rays
    rng = np.random.default_rng(7)
    g_co = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    g_fi = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))

    def loss_ref(p):
        c_co, c_fi = _unfused(p, origins, dirs, t_co, near, far, white_bkgd)
        return jnp.sum(c_co * g_co) + jnp.sum(c_fi * g_fi)

    def loss_k(p):
        c_co, c_fi = rk.render_fused(p, origins, dirs, t_co, near, far, NF,
                                     white_bkgd=white_bkgd,
                                     compute_dtype=jnp.float32)
        return jnp.sum(c_co * g_co) + jnp.sum(c_fi * g_fi)

    grads_ref = jax.grad(loss_ref)(params)
    grads_k = jax.grad(loss_k)(params)
    for name in grads_ref:
        for leaf in ("w", "b"):
            a = np.asarray(grads_k[name][leaf]).ravel()
            b = np.asarray(grads_ref[name][leaf]).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            cos = float(a @ b / (na * nb + 1e-30))
            # direction must match tightly; norms within 1% (per-element
            # equality is fp-chaotic through the resampler's 1/(w+eps))
            assert cos > 0.9999, f"{name}/{leaf}: cos={cos}"
            assert abs(na - nb) / (nb + 1e-12) < 1e-2, \
                f"{name}/{leaf}: |fused|={na} |ref|={nb}"


def test_ray_inputs_get_zero_cotangents(rays):
    params, origins, dirs, t_co, near, far = rays

    def loss(o):
        _, c_fi = rk.render_fused(params, o, dirs, t_co, near, far, NF,
                                  compute_dtype=jnp.float32)
        return jnp.sum(c_fi)

    g = jax.grad(loss)(origins)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_fused_composes_with_occ_grid(rays):
    """render_rays routes through the fused kernel after tighten_bounds;
    an all-inf (fully occupied) grid must leave the result unchanged."""
    from tinynerf.core import occupancy, render

    params, origins, dirs, t_co, near, far = rays
    field_fn = _pallas_field()
    import tinynerf.kernels.render_kernel as rk2
    import functools
    field_fn.render_fused = functools.partial(rk2.render_fused,
                                              compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    hw = 16.0
    rows = jnp.asarray(rng.uniform(0, hw, B).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, hw, B).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.3, -0.2, 4.0]
    hwf = np.array([[hw], [hw], [19.2]], np.float32)
    p17 = jnp.asarray(np.tile(np.concatenate(
        [np.concatenate([c2w[:3, :4], hwf], 1).flatten(), [2.0, 6.0]]),
        (B, 1)).astype(np.float32))
    k_inv = make_k_inv(hw, hw, 19.2)
    grid = occupancy.init_grid(resolution=8, half_extent=8.0)  # all occupied
    base = render.render_rays(params, rows, cols, p17, k_inv, NC, NF,
                              field_fn=field_fn, merge_impl="twolist")
    with_occ = render.render_rays(params, rows, cols, p17, k_inv, NC, NF,
                                  field_fn=field_fn, occ_grid=grid,
                                  merge_impl="twolist")
    np.testing.assert_allclose(np.asarray(with_occ[1]), np.asarray(base[1]),
                               atol=1e-6)


def test_fused_routing_eval_only(rays):
    """The fused renderer serves grad-free (twolist) renders only; training
    (permute merge) keeps the per-pass kernels + XLA tail, which measured
    ~3x faster for the backward on v5e."""
    from tinynerf import train as trainlib
    from tinynerf.config import Config
    from tinynerf.core import render

    params, origins, dirs, t_co, near, far = rays
    cfg = Config(batch_ray=B, n_coarse=NC, n_fine=NF, use_pallas=True,
                 fused_render=True)
    field_fn = trainlib.make_field_fn(cfg, force_pallas=True)
    assert getattr(field_fn, "render_fused", None) is not None

    calls = []
    inner = field_fn.render_fused

    def counting(*a, **k):
        calls.append(1)
        return inner(*a, **k)

    field_fn.render_fused = counting
    rng = np.random.default_rng(0)
    hw = 16.0
    rows = jnp.asarray(rng.uniform(0, hw, B).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, hw, B).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32); c2w[:3, 3] = [0, 0, 4.0]
    hwf = np.array([[hw], [hw], [19.2]], np.float32)
    p17 = jnp.asarray(np.tile(np.concatenate(
        [np.concatenate([c2w[:3, :4], hwf], 1).flatten(), [2.0, 6.0]]),
        (B, 1)).astype(np.float32))
    k_inv = make_k_inv(hw, hw, 19.2)

    # eval path (twolist): routes through the fused kernel
    out = render.render_rays(params, rows, cols, p17, k_inv, NC, NF,
                             field_fn=field_fn, merge_impl="twolist")
    assert len(calls) == 1 and np.isfinite(np.asarray(out[1])).all()
    # training path (permute): must NOT
    out2 = render.render_rays(params, rows, cols, p17, k_inv, NC, NF,
                              field_fn=field_fn, merge_impl="permute")
    assert len(calls) == 1 and np.isfinite(np.asarray(out2[1])).all()
