"""Fused Pallas PE+MLP kernel vs the pure-jnp reference path, in interpreter
mode on CPU (the compiled Mosaic path is exercised on real TPU hardware by
bench.py and the driver's entry checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tinynerf.kernels.mlp_kernel as mk
from tinynerf.core import mlp, render


@pytest.fixture(scope="module", autouse=True)
def interpret_mode():
    prev = mk.INTERPRET
    mk.INTERPRET = True
    yield
    mk.INTERPRET = prev


@pytest.fixture(scope="module")
def data():
    params = mlp.init_network(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    R = 300  # deliberately not a multiple of the tile -> tests padding
    pts = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return params, pts, dirs


def test_forward_matches_field_jnp(data):
    params, pts, dirs = data
    c_ref, s_ref = render.field_jnp(params, pts, dirs)
    c_k, s_k = mk.field_pallas(params, pts, dirs, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), atol=1e-5)


def test_forward_batched_shape(data):
    params, pts, dirs = data
    pts3 = pts[:296].reshape(8, 37, 3)
    dirs3 = dirs[:296].reshape(8, 37, 3)
    c, s = mk.field_pallas(params, pts3, dirs3, compute_dtype=jnp.float32)
    assert c.shape == (8, 37, 3) and s.shape == (8, 37, 1)


def test_custom_vjp_matches_autodiff(data):
    params, pts, dirs = data
    rng = np.random.default_rng(1)
    g_c = jnp.asarray(rng.normal(size=(pts.shape[0], 3)).astype(np.float32))
    g_s = jnp.asarray(rng.normal(size=(pts.shape[0], 1)).astype(np.float32))

    def loss_ref(p, x, d):
        c, s = render.field_jnp(p, x, d)
        return jnp.sum(c * g_c) + jnp.sum(s * g_s)

    def loss_k(p, x, d):
        c, s = mk.field_pallas(p, x, d, compute_dtype=jnp.float32)
        return jnp.sum(c * g_c) + jnp.sum(s * g_s)

    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, pts, dirs)
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(params, pts, dirs)

    for name in gref[0]:
        for part in ("w", "b"):
            a = np.asarray(gref[0][name][part])
            b = np.asarray(gk[0][name][part])
            scale = np.max(np.abs(a)) + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-5,
                                       err_msg=f"{name}/{part}")
    # coordinate grads (flow into the resampler, Q8)
    np.testing.assert_allclose(
        np.asarray(gk[1]) / (np.max(np.abs(gref[1])) + 1e-8),
        np.asarray(gref[1]) / (np.max(np.abs(gref[1])) + 1e-8), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gk[2]) / (np.max(np.abs(gref[2])) + 1e-8),
        np.asarray(gref[2]) / (np.max(np.abs(gref[2])) + 1e-8), atol=2e-5)


@pytest.fixture(scope="module")
def ray_data():
    """Dyadic (1/16-quantized) coordinates: the in-kernel ``o + t*d``
    expansion then rounds identically to XLA's staged version, so the test
    isolates the kernel math from 1-ulp fp divergence — which at PE
    arguments ~2^10*pi*|x| flips sin/cos and relu masks and would otherwise
    drown the comparison (the row-kernel control on unquantized data shows
    the kernel itself is exact to ~1e-9)."""
    params = mlp.init_network(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    B, N = 13, 8  # B deliberately not a multiple of the ray tile
    q = lambda x: np.round(x * 16.0) / 16.0
    origins = jnp.asarray(q(rng.uniform(-1, 1, (B, 3))).astype(np.float32))
    d = rng.normal(size=(B, 3))
    dirs = jnp.asarray(
        q(d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32))
    ts = jnp.asarray(np.sort(q(rng.uniform(2.0, 6.0, (B, N))).astype(
        np.float32), axis=1))
    return params, origins, dirs, ts


def _ref_ray_field(params, origins, dirs, ts):
    pts = origins[:, None, :] + ts[..., None] * dirs[:, None, :]
    dirs_b = jnp.broadcast_to(dirs[:, None, :], pts.shape)
    return render.field_jnp(params, pts, dirs_b)


def test_ray_forward_matches_field_jnp(ray_data):
    params, origins, dirs, ts = ray_data
    c_ref, s_ref = _ref_ray_field(params, origins, dirs, ts)
    s_ref = jnp.squeeze(s_ref, -1)  # eval_rays contract: sigma is (B, N)
    c_k, s_k = mk.field_pallas_rays(params, origins, dirs, ts,
                                    compute_dtype=jnp.float32)
    # eval_rays contract: color is a (r, g, b) tuple of dense (B, N) planes
    assert isinstance(c_k, tuple) and len(c_k) == 3
    c_k = jnp.stack(c_k, axis=-1)
    assert c_k.shape == c_ref.shape and s_k.shape == s_ref.shape
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), atol=1e-5)


def test_ray_vjp_matches_autodiff(ray_data):
    """The fused backward must emit correct grads for origins, dirs AND ts
    (the resampler path, Q8) plus all weight grads."""
    params, origins, dirs, ts = ray_data
    rng = np.random.default_rng(4)
    g_c = jnp.asarray(rng.normal(size=ts.shape + (3,)).astype(np.float32))
    g_s = jnp.asarray(rng.normal(size=ts.shape).astype(np.float32))

    def loss_ref(p, o, d, t):
        c, s = _ref_ray_field(p, o, d, t)
        return jnp.sum(c * g_c) + jnp.sum(jnp.squeeze(s, -1) * g_s)

    def loss_k(p, o, d, t):
        c, s = mk.field_pallas_rays(p, o, d, t, compute_dtype=jnp.float32)
        return jnp.sum(jnp.stack(c, axis=-1) * g_c) + jnp.sum(s * g_s)

    gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, origins, dirs, ts)
    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(params, origins, dirs, ts)

    def check(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-5,
                                   err_msg=msg)

    for name in gref[0]:
        for part in ("w", "b"):
            check(gref[0][name][part], gk[0][name][part], f"{name}/{part}")
    for k in (1, 2, 3):  # d_origins, d_dirs, d_ts
        check(gref[k], gk[k], f"arg {k}")


def test_render_rays_with_ray_entry_matches_plain(ray_data):
    """render_rays via a field_fn carrying eval_rays == the plain jnp path."""
    import functools
    from tinynerf.core.rays import make_k_inv
    from tests.test_rays import _pose17
    params, _, _, _ = ray_data
    k_inv = make_k_inv(8.0, 8.0, 10.0)
    pose = jnp.asarray(np.tile(_pose17(np.eye(4), 8, 8, 10.0, 2.0, 6.0),
                               (5, 1)))
    rows = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32))
    cols = jnp.asarray(np.array([5.0, 4.0, 3.0, 2.0, 1.0], np.float32))
    base = render.render_rays(params, rows, cols, pose, k_inv, 4, 8)
    fn = functools.partial(mk.field_pallas, compute_dtype=jnp.float32)
    fn.eval_rays = functools.partial(mk.field_pallas_rays,
                                     compute_dtype=jnp.float32)
    fused = render.render_rays(params, rows, cols, pose, k_inv, 4, 8,
                               field_fn=fn)
    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(base[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused[1]), np.asarray(base[1]),
                               atol=1e-5)


def test_pack_unpack_roundtrip_shapes(data):
    params, _, _ = data
    packed = mk.pack_params(params, jnp.float32)
    assert packed["w0"].shape == (60, 256)
    assert packed["w4h"].shape == (256, 256)
    assert packed["w4e"].shape == (60, 256)
    assert packed["wde"].shape == (24, 128)
    assert packed["wdp"].shape == (256, 128)
    # permutation must be a bijection
    assert sorted(mk._POINT_PERM.tolist()) == list(range(60))
    assert sorted(mk._DIR_PERM.tolist()) == list(range(24))


def test_layout_permutation_correctness():
    # kernel row k of [sin-block | cos-block] must map to the reference's
    # interleaved channel-major row
    L = 10
    perm = mk._layout_perm(L)
    # kernel layout is freq-major (k = l*3 + c, the pltpu.repeat pattern)
    # kernel k=0: sin f0 of channel x -> ref row 0
    assert perm[0] == 0
    # kernel k=3L: cos f0 of channel x -> ref row 1
    assert perm[3 * L] == 1
    # kernel k=1 (sin f0 of y) -> ref row 2L (y block start)
    assert perm[1] == 2 * L
    # kernel k=3 (sin f1 of x) -> ref row 2
    assert perm[3] == 2
