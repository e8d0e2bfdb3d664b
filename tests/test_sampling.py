import numpy as np
import jax
import jax.numpy as jnp

from tinynerf.core import sampling


def test_coarse_ts_matches_np_linspace():
    near = jnp.array([2.0, 1.0])
    far = jnp.array([6.0, 9.0])
    ts = np.asarray(sampling.coarse_ts(near, far, 64))
    ref = np.linspace((2.0, 1.0), (6.0, 9.0), 64).T  # nerf.py:288
    np.testing.assert_allclose(ts, ref, rtol=1e-6)


def test_coarse_ts_stratified_stays_in_bounds():
    near = jnp.array([2.0]); far = jnp.array([6.0])
    ts = np.asarray(sampling.coarse_ts(near, far, 32, key=jax.random.PRNGKey(0)))
    assert ts.min() >= 2.0 and ts.max() <= 6.0
    assert np.all(np.diff(ts[0]) > 0)  # still sorted


def _numpy_resample(t_coarse, dense, delta, n_fine):
    """Host transcription of the reference resample (nerf.py:225-261) with
    per-ray delta (D3) — the oracle for the on-device version."""
    cdf = np.cumsum(dense, axis=1)
    high, low = cdf.max(axis=1), cdf.min(axis=1)
    slope_inv = delta[:, None] / (dense[:, 1:] + 1e-7)
    t_inv = np.linspace(tuple(low), tuple(high), n_fine + 2)[1:-1].T
    idx = np.searchsorted(cdf[0], t_inv[0], side="left")[None] - 1 \
        if cdf.shape[0] == 1 else np.stack(
            [np.searchsorted(cdf[i], t_inv[i], side="left") - 1
             for i in range(cdf.shape[0])])
    idx = np.clip(idx, 0, t_coarse.shape[1] - 1)
    temp = np.concatenate([slope_inv, np.zeros((dense.shape[0], 1))], axis=1)
    lower_t = np.take_along_axis(t_coarse, idx, axis=1)
    lower_cdf = np.take_along_axis(cdf, idx, axis=1)
    lower_slope = np.take_along_axis(temp, idx, axis=1)
    return lower_t + (t_inv - lower_cdf) * lower_slope


def test_resample_matches_host_oracle():
    rng = np.random.default_rng(0)
    B, Nc, Nf = 4, 16, 8
    near, far = 2.0, 6.0
    t_coarse = np.linspace(near, far, Nc)[None].repeat(B, 0)
    dense = rng.uniform(0.01, 1.0, size=(B, Nc))
    delta = np.full((B,), (far - near) / Nc)
    ours = np.asarray(sampling.resample(
        jnp.asarray(t_coarse, jnp.float32), jnp.asarray(dense, jnp.float32),
        jnp.asarray(delta, jnp.float32), Nf))
    ref = _numpy_resample(t_coarse, dense, delta, Nf)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_resample_uniform_density_gives_uniform_ts():
    # flat density -> CDF is linear -> inverse sampling returns uniform spacing
    B, Nc, Nf = 2, 32, 16
    t_coarse = jnp.broadcast_to(jnp.linspace(2.0, 6.0, Nc), (B, Nc))
    dense = jnp.ones((B, Nc)) * 0.5
    delta = jnp.full((B,), 4.0 / Nc)
    t_fine = np.asarray(sampling.resample(t_coarse, dense, delta, Nf))
    spacing = np.diff(t_fine, axis=1)
    # small (<2%) kinks at CDF bin crossings are inherent to the reference's
    # piecewise-linear inverse with the shifted-slope table (nerf.py:239)
    np.testing.assert_allclose(
        spacing, np.broadcast_to(spacing[:, :1], spacing.shape), rtol=0.03)
    assert np.all(t_fine >= 2.0 - 1e-5) and np.all(t_fine <= 6.0 + 1e-5)


def test_resample_concentrates_where_density_peaks():
    B, Nc, Nf = 1, 64, 32
    t_coarse = jnp.linspace(2.0, 6.0, Nc)[None]
    # density peaked in bins around t ~ 4.0
    dense = np.full((B, Nc), 1e-3)
    dense[:, 30:34] = 10.0
    delta = jnp.full((B,), 4.0 / Nc)
    t_fine = np.asarray(sampling.resample(
        t_coarse, jnp.asarray(dense, jnp.float32), delta, Nf))
    frac_near_peak = np.mean((t_fine > 3.6) & (t_fine < 4.4))
    assert frac_near_peak > 0.8


def test_resample_output_sorted_and_differentiable():
    B, Nc, Nf = 3, 16, 8
    t_coarse = jnp.broadcast_to(jnp.linspace(1.0, 5.0, Nc), (B, Nc))
    delta = jnp.full((B,), 4.0 / Nc)

    def f(dense):
        return jnp.sum(sampling.resample(t_coarse, dense, delta, Nf))

    dense = jnp.asarray(
        np.random.default_rng(1).uniform(0.1, 1.0, (B, Nc)), jnp.float32)
    t_fine = sampling.resample(t_coarse, dense, delta, Nf)
    assert np.all(np.diff(np.asarray(t_fine), axis=1) >= -1e-5)
    g = jax.grad(f)(dense)
    assert float(jnp.sum(jnp.abs(g))) > 0  # grads flow into coarse density (Q8)


def test_merge_sorted_ts():
    t_co = jnp.array([[1.0, 3.0, 5.0]])
    t_fi = jnp.array([[2.0, 4.0]])
    t_all, ranks = sampling.merge_sorted_ts(t_co, t_fi)
    merged = np.asarray(sampling.apply_ranks(ranks, t_all))
    np.testing.assert_allclose(merged[0], [1, 2, 3, 4, 5])


def test_sort_ranks_matches_stable_argsort():
    rng = np.random.default_rng(0)
    t = rng.uniform(0, 1, (8, 33)).astype(np.float32)
    t[:, 5] = t[:, 20]  # inject ties — must break by original index
    ranks = np.asarray(sampling.sort_ranks(jnp.asarray(t)))
    x = rng.normal(size=(8, 33)).astype(np.float32)
    sorted_x = np.asarray(sampling.apply_ranks(jnp.asarray(ranks),
                                               jnp.asarray(x)))
    order = np.argsort(t, axis=1, kind="stable")
    np.testing.assert_allclose(sorted_x, np.take_along_axis(x, order, axis=1),
                               atol=1e-6)


def test_onehot_gather_and_matmul_cumsum():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(4, 16)).astype(np.float32)
    idx = rng.integers(0, 16, (4, 9)).astype(np.int32)
    got = np.asarray(sampling.onehot_gather(jnp.asarray(v), jnp.asarray(idx)))
    np.testing.assert_allclose(got, np.take_along_axis(v, idx, axis=1),
                               atol=1e-6)
    c = np.asarray(sampling.matmul_cumsum(jnp.asarray(v)))
    np.testing.assert_allclose(c, np.cumsum(v, axis=1), rtol=1e-5, atol=1e-5)
