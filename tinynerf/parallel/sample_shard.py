"""Sample-axis sharding — the volumetric analog of sequence parallelism.

The reference model has no attention; its long axes are rays and
samples-per-ray (SURVEY.md §2.17, §5). For very deep marches the per-ray
sample dimension can be split across devices. Transmittance is a prefix
product ``T_i = exp(-sum_{j<=i} sigma_j delta_j)`` (reference
``nerf.py:267-268``), so cross-device composition needs a per-ray carry: the
exclusive prefix (across devices) of each device's local ``sum(sigma*delta)``
— exchanged in log-space with a ``ppermute`` hop chain, the ring-attention
analog for volume rendering.

Shipped as a working demonstrator (`sharded_get_density`, `sharded_composite`)
with fake-device CPU tests; ray-DP remains the workhorse default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SAMPLE_AXIS = "sample"


def _exclusive_device_prefix_sum(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Exclusive prefix sum of ``x`` across devices on ``axis_name``.

    Hillis–Steele doubling: log2(n) ppermute hops, each shifting partial sums
    one power of two down the ring. Works for any device count (non-power-of-2
    included) because shifted-off-the-end contributions are simply absent.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # start from inclusive = own value, then convert to exclusive at the end
    acc = x
    shift = 1
    while shift < n:
        perm = [(src, src + shift) for src in range(n - shift)]
        received = jax.lax.ppermute(acc, axis_name, perm)
        acc = jnp.where(idx >= shift, acc + received, acc)
        shift *= 2
    # exclusive = inclusive - own
    return acc - x


def sharded_get_density(delta: jnp.ndarray, sigma: jnp.ndarray,
                        axis_name: str = SAMPLE_AXIS) -> jnp.ndarray:
    """Compositing weights when the sample axis is sharded across devices.

    Each device holds a contiguous (B, N_local) chunk of (delta, sigma).
    Matches ``tinynerf.core.render.get_density`` on the concatenation
    (inclusive-cumsum transmittance, reference semantics Q5).
    """
    from tinynerf.core.sampling import matmul_cumsum
    sigma_delta = delta * sigma
    local_cumsum = matmul_cumsum(sigma_delta)                # within-chunk
    local_total = local_cumsum[:, -1]                         # (B,)
    carry = _exclusive_device_prefix_sum(local_total, axis_name)  # (B,)
    transmittance = jnp.exp(-(carry[:, None] + local_cumsum))
    return transmittance * (1.0 - jnp.exp(-sigma_delta))


def sharded_composite(weights: jnp.ndarray, color: jnp.ndarray,
                      axis_name: str = SAMPLE_AXIS) -> jnp.ndarray:
    """sum_i w_i rgb_i with the sample axis sharded: local partial sums then
    one psum over the sample axis. (B, N_local), (B, N_local, 3) -> (B, 3)."""
    partial = jnp.sum(weights[..., None] * color, axis=1)
    return jax.lax.psum(partial, axis_name)


# ----------------------------------------------------------------------------
# Sample-sharded hierarchical renderer: the deep-march path (SURVEY §2.17).
#
# The single-device merged composite is O(N_c * N_f) in memory per ray
# (cross-compare masks, core/render.py) and the permute path O(N^2) — fine at
# the reference's 64+128, quadratic for deep marches. Here the FINE sample
# axis (the deep one) is sharded over a mesh axis: each device evaluates and
# composites only N_f / n_shards samples, so the mask memory AND the field
# FLOPs divide by the shard count. Cross-shard state is exactly two kinds:
# the per-ray prefix transmittance carry (Hillis-Steele ppermute scan above)
# and each shard's boundary successor (one ppermute hop).
# ----------------------------------------------------------------------------


def _neighbor_first(t_first: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Each shard receives the NEXT shard's first column (for successor
    deltas at the shard boundary); the last shard receives +inf."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if n == 1:
        return jnp.full_like(t_first, jnp.finfo(t_first.dtype).max)
    received = jax.lax.ppermute(
        t_first, axis_name, [(src, src - 1) for src in range(1, n)])
    big = jnp.asarray(jnp.finfo(t_first.dtype).max, t_first.dtype)
    return jnp.where(idx == n - 1, big, received)


def sharded_merged_fine(t_co, t_fi_local, sigma_co, sigma_fi_local,
                        color_co, color_fi_local,
                        tail: float = 1e-4, white_bkgd: bool = False,
                        axis_name: str = SAMPLE_AXIS) -> jnp.ndarray:
    """Merged coarse+fine composite with the FINE sample axis sharded.

    Numerically equal to ``render.merged_composite`` on the concatenation of
    all shards' fine samples. Coarse arrays are replicated across the sample
    axis; fine arrays hold this shard's contiguous (sorted) span. Colors are
    per-channel tuples of dense (B, N) planes, like the single-device path.

    Per-shard memory: the (B, N_c, N_f_local) masks — the full-merge mask
    divided by the shard count. Collectives per call: one ppermute hop
    (boundary successor), one log-hops prefix scan (transmittance carry),
    and three psums (coarse cross-mass, fine count is local; final color).
    """
    dtype = t_co.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    # fewer[b,i,j]: local fine_j strictly before coarse_i
    fewer = t_fi_local[:, None, :] < t_co[:, :, None]    # (B, N_c, N_f_loc)

    inf_col = jnp.full_like(t_co[:, :1], big)
    next_own_co = jnp.concatenate([t_co[:, 1:], inf_col], axis=1)
    # successor of the last LOCAL fine sample lives on the next shard
    neighbor = _neighbor_first(t_fi_local[:, :1], axis_name)
    next_own_fi = jnp.concatenate([t_fi_local[:, 1:], neighbor], axis=1)

    # coarse successor among fine: min over ALL shards' candidates
    cand_co_local = jnp.min(
        jnp.where(fewer, big, t_fi_local[:, None, :]), axis=2)
    cand_co = jax.lax.pmin(cand_co_local, axis_name)
    cand_fi = jnp.min(jnp.where(fewer, t_co[:, :, None], big), axis=1)
    next_co = jnp.minimum(next_own_co, cand_co)
    next_fi = jnp.minimum(next_own_fi, cand_fi)
    delta_co = jnp.where(next_co >= big, tail, next_co - t_co)
    delta_fi = jnp.where(next_fi >= big, tail, next_fi - t_fi_local)

    sd_co = sigma_co * delta_co
    sd_fi = sigma_fi_local * delta_fi

    # prefix masses: coarse own-prefix is replicated math; fine own-prefix
    # needs the cross-shard carry (this module's prefix scan). matmul_cumsum
    # per the repo invariant — XLA lowers jnp.cumsum as a sequential shift
    # chain on TPU, the triangular matmul rides the MXU.
    from tinynerf.core.sampling import matmul_cumsum
    own_co = matmul_cumsum(sd_co)
    local_cumsum_fi = matmul_cumsum(sd_fi)
    carry = _exclusive_device_prefix_sum(local_cumsum_fi[:, -1], axis_name)
    own_fi = carry[:, None] + local_cumsum_fi

    mask = fewer.astype(dtype)
    cross_co_local = jax.lax.dot_general(
        mask, sd_fi, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)
    cross_co = jax.lax.psum(cross_co_local, axis_name)   # (B, N_c)
    cross_fi = jax.lax.dot_general(
        1.0 - mask, sd_co, (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)             # (B, N_f_loc)

    w_co = jnp.exp(-(own_co + cross_co)) * (1.0 - jnp.exp(-sd_co))
    w_fi = jnp.exp(-(own_fi + cross_fi)) * (1.0 - jnp.exp(-sd_fi))

    def comp(weights, chans):
        return jnp.stack([jnp.sum(weights * c, axis=1) for c in chans],
                         axis=-1)

    out = (comp(w_co, color_co) / jax.lax.axis_size(axis_name)
           + comp(w_fi, color_fi_local))
    out = jax.lax.psum(out, axis_name)
    if white_bkgd:
        acc = (jnp.sum(w_co, axis=1) / jax.lax.axis_size(axis_name)
               + jnp.sum(w_fi, axis=1))
        acc = jax.lax.psum(acc, axis_name)
        out = out + (1.0 - acc)[:, None]
    return out


def make_sample_sharded_render(mesh, k_inv, n_coarse: int, n_fine: int,
                               field_fn=None, white_bkgd: bool = False,
                               data_axis: str = "data",
                               sample_axis: str = SAMPLE_AXIS):
    """Full hierarchical render with rays sharded over ``data_axis`` AND the
    fine sample axis sharded over ``sample_axis`` — the deep-march (SP
    analog) path behind the SAMPLE_SHARD config key.

    Returns a jitted ``(params, rows, cols, pose17) -> (C_coarse, C_fine)``
    numerically equal to single-device ``render_rays`` (twolist merge). Each
    device evaluates n_fine / n_sample_shards fine samples: field FLOPs and
    the merge's cross-compare masks both divide by the shard count, so
    N_FINE=512+ marches run without the quadratic single-device blowup.

    The coarse pass (n_coarse samples, the shallow axis) is computed
    replicated across the sample axis — its cost is the demonstrator's
    overhead bound, ~n_coarse / (n_fine / n_shards) of a shard's fine work.
    """
    from jax.sharding import PartitionSpec as P

    from tinynerf.core import render as renderlib
    from tinynerf.core import sampling
    from tinynerf.core.rays import pixels_to_rays

    field_fn = field_fn or renderlib.field_jnp
    n_shards = mesh.shape[sample_axis]
    assert n_fine % n_shards == 0, (n_fine, n_shards)
    n_local = n_fine // n_shards

    def local_fn(params, rows, cols, pose17):
        origins, dirs, near, far = pixels_to_rays(rows, cols, pose17, k_inv)
        t_co = sampling.coarse_ts(near, far, n_coarse)
        color_co, sigma_co = renderlib._eval_field(
            field_fn, params, origins, dirs, t_co)
        delta_ray = (far - near) / n_coarse
        dense_co = renderlib.get_density(
            jnp.broadcast_to(delta_ray[:, None], t_co.shape), sigma_co)
        c_coarse = renderlib.composite(dense_co, color_co)
        if white_bkgd:
            c_coarse = c_coarse + (1.0 - jnp.sum(dense_co, axis=1))[:, None]

        # this shard's contiguous slice of the N_f inverse-CDF levels
        start = jax.lax.axis_index(sample_axis) * n_local
        t_fi = sampling.resample(t_co, dense_co,
                                 (far - near) / (n_coarse - 1), n_fine,
                                 level_start=start, level_count=n_local)
        color_fi, sigma_fi = renderlib._eval_field(
            field_fn, params, origins, dirs, t_fi)
        c_fine = sharded_merged_fine(
            t_co, t_fi, sigma_co, sigma_fi, color_co, color_fi,
            tail=renderlib.TAIL_DELTA, white_bkgd=white_bkgd,
            axis_name=sample_axis)
        return c_coarse, c_fine

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
        check_vma=False)
    return jax.jit(sharded)
