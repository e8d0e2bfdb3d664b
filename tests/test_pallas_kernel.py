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
