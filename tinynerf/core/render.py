"""Volume rendering: coarse + hierarchical fine march, compositing, loss.

Reference algorithm: ``nerf.py:263-348`` (SURVEY.md §2.7). Semantics kept:

- Q5: **inclusive** cumsum in the transmittance exponent:
  ``w_i = exp(-sum_{j<=i} sigma_j delta_j) * (1 - exp(-sigma_i delta_i))``
  (``nerf.py:267-268``; standard NeRF uses the exclusive sum — the reference's
  variant differs by a factor ``exp(-sigma_i delta_i)`` and is reproduced as
  the default).
- coarse deltas are the constant per-ray ``(far - near) / N_c``
  (``nerf.py:293``); the combined pass uses ``diff(t)`` with a constant
  ``1e-4`` tail (``nerf.py:286,315``).
- loss is a **sum** (not mean) of squared errors over batch and RGB for both
  passes (``nerf.py:325-331``, Q14).
- Q4 fixed (decision D3): the combined coarse+fine pass sorts **by t** and
  gathers rgb/sigma with the same permutation. The reference's
  ``torch.sort`` of the (t, rgb, sigma) bundle sorts every channel
  independently, decoupling them (``nerf.py:308``); ``compat_sort=True``
  reproduces that defect bit-for-bit for parity experiments.

The network evaluation is pluggable via ``field_fn(params, points, dirs) ->
(color, sigma)`` so the fused Pallas kernel (``tinynerf/kernels``) and the
pure-jnp path are interchangeable.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tinynerf.core import encoding, mlp, rays as raylib, sampling

TAIL_DELTA = 1e-4  # reference `last` (nerf.py:286)

FieldFn = Callable[[mlp.Params, jnp.ndarray, jnp.ndarray],
                   Tuple[jnp.ndarray, jnp.ndarray]]


def field_jnp(params: mlp.Params, points: jnp.ndarray, dirs: jnp.ndarray,
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-exact pure-jnp field: positional-encode then MLP.

    points, dirs: (..., 3) -> (color (..., 3), sigma (..., 1)).
    """
    point_enc = encoding.encode_points(points)
    dir_enc = encoding.encode_dirs(dirs)
    return mlp.apply_network(params, point_enc, dir_enc)


def get_density(delta: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Compositing weights with the reference's inclusive-cumsum transmittance
    (``nerf.py:263-272``). delta, sigma: (B, N) -> weights (B, N)."""
    sigma_delta = delta * sigma
    transmittance = jnp.exp(-sampling.matmul_cumsum(sigma_delta))
    return transmittance * (1.0 - jnp.exp(-sigma_delta))


def _as_channels(color) -> Tuple[jnp.ndarray, ...]:
    """Normalize a color representation to the per-channel tuple form.

    The hot path carries color as a tuple of three dense (B, N) planes —
    the layout the Pallas ray kernels emit, which keeps XLA from storing a
    3-of-128-lane padded (B, N, 3) and relaying it out for every tail op
    (measured ~1.2 ms/step of copies at production shapes). A (B, N, 3)
    array is accepted for the pure-jnp field and tests."""
    if isinstance(color, (tuple, list)):
        return tuple(color)
    return tuple(color[..., c] for c in range(3))


def composite(weights: jnp.ndarray, color) -> jnp.ndarray:
    """Sum_i w_i * rgb_i (``nerf.py:274-281``).

    (B,N) weights x color ((B,N,3) or per-channel ((B,N),)x3) -> (B,3)."""
    chans = _as_channels(color)
    return jnp.stack([jnp.sum(weights * c, axis=1) for c in chans], axis=-1)


def merged_composite(t_co: jnp.ndarray, t_fi: jnp.ndarray,
                     sigma_co: jnp.ndarray, sigma_fi: jnp.ndarray,
                     color_co, color_fi,
                     tail: float = TAIL_DELTA,
                     white_bkgd: bool = False,
                     return_extras: bool = False):
    """Composite the MERGED coarse+fine sample set without ever sorting.

    Mathematically identical to sort-by-t -> diff -> inclusive-cumsum
    density -> composite (the Q4-fixed combined pass), but exploits that both
    lists are per-ray sorted: the merge is fully described by the
    (B, N_c, N_f) cross-compare masks, and those masks are consumed DIRECTLY
    — successors are masked min-reductions over them, and each sample's
    cross-list prefix mass is one batched mask @ sd matmul. No cumsum+gather
    indirection, no (B, N, N) permutation one-hots: the only large
    intermediates are the two compare masks, ~18x smaller than a materialized
    sort of the concatenated list, and every heavy op is a compare, a
    reduction or a matmul (TPU-friendly; VJP is transposed matmuls over the
    same masks, no scatters).

    Tie-breaking matches a stable sort of concat([coarse, fine]): an equal-t
    pair orders the coarse sample first.
    """
    dtype = t_co.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    # fewer[b,i,j]: fine_j strictly before coarse_i (equivalently coarse_i
    # strictly after fine_j — the one mask drives both directions)
    fewer = t_fi[:, None, :] < t_co[:, :, None]              # (B, N_c, N_f)

    # merged successor of each sample: own next vs first cross-list sample
    # at/after it (for coarse: fine with t_fi >= t_co, ties go to the fine
    # side since equal-t coarse sorts first; for fine: coarse with t_co >
    # t_fi, an equal-t coarse sorts BEFORE the fine)
    inf_col = jnp.full_like(t_co[:, :1], big)
    next_own_co = jnp.concatenate([t_co[:, 1:], inf_col], axis=1)
    next_own_fi = jnp.concatenate([t_fi[:, 1:], inf_col], axis=1)
    cand_co = jnp.min(jnp.where(fewer, big, t_fi[:, None, :]), axis=2)
    cand_fi = jnp.min(jnp.where(fewer, t_co[:, :, None], big), axis=1)
    next_co = jnp.minimum(next_own_co, cand_co)
    next_fi = jnp.minimum(next_own_fi, cand_fi)
    # the globally last sample has no successor -> constant tail delta
    # (reference nerf.py:286,315)
    delta_co = jnp.where(next_co >= big, tail, next_co - t_co)
    delta_fi = jnp.where(next_fi >= big, tail, next_fi - t_fi)

    sd_co = sigma_co * delta_co
    sd_fi = sigma_fi * delta_fi
    own_co = sampling.matmul_cumsum(sd_co)                   # (B, N_c)
    own_fi = sampling.matmul_cumsum(sd_fi)                   # (B, N_f)
    # cross-list prefix mass, straight off the compare mask (batched matvec):
    # coarse_i accumulates every fine strictly before it; fine_j accumulates
    # every coarse at/before it (ties coarse-first => inclusive)
    mask = fewer.astype(dtype)
    cross_co = jax.lax.dot_general(
        mask, sd_fi, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)                 # (B, N_c)
    cross_fi = jax.lax.dot_general(
        1.0 - mask, sd_co, (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)                 # (B, N_f)

    w_co = jnp.exp(-(own_co + cross_co)) * (1.0 - jnp.exp(-sd_co))
    w_fi = jnp.exp(-(own_fi + cross_fi)) * (1.0 - jnp.exp(-sd_fi))
    out = composite(w_co, color_co) + composite(w_fi, color_fi)
    acc = jnp.sum(w_co, axis=1) + jnp.sum(w_fi, axis=1)
    if white_bkgd:
        out = out + (1.0 - acc)[:, None]
    if return_extras:
        # expected termination distance + opacity (standard NeRF outputs
        # the reference lacks): depth = sum_i w_i t_i / sum_i w_i
        depth = ((jnp.sum(w_co * t_co, axis=1) + jnp.sum(w_fi * t_fi, axis=1))
                 / jnp.maximum(acc, 1e-10))
        return out, depth, acc
    return out


def _eval_field(field_fn: FieldFn, params: mlp.Params, origins: jnp.ndarray,
                dirs: jnp.ndarray, ts: jnp.ndarray,
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the field at ``origin + t * dir`` for each (ray, sample).

    Field fns may expose an ``eval_rays(params, origins, dirs, ts)``
    attribute (the fused Pallas path does): it performs the ray->point
    expansion inside the kernel, keeping the (B*N, 3) coordinate tensors —
    which XLA tiles at 3/128 lane occupancy — out of HBM entirely."""
    ray_eval = getattr(field_fn, "eval_rays", None)
    if ray_eval is not None:
        # eval_rays returns ((r, g, b), sigma), every plane dense (B, N)
        return ray_eval(params, origins, dirs, ts)
    points = origins[:, None, :] + ts[..., None] * dirs[:, None, :]
    dirs_b = jnp.broadcast_to(dirs[:, None, :], points.shape)
    color, sigma = field_fn(params, points, dirs_b)
    return _as_channels(color), jnp.squeeze(sigma, axis=-1)


def render_rays(params: mlp.Params,
                rows: jnp.ndarray, cols: jnp.ndarray, pose17: jnp.ndarray,
                k_inv: jnp.ndarray,
                n_coarse: int, n_fine: int,
                field_fn: FieldFn = field_jnp,
                key: Optional[jax.Array] = None,
                compat_sort: bool = False,
                ndc_params: Optional[Tuple[float, float, float]] = None,
                merge_impl: str = "permute",
                white_bkgd: bool = False,
                occ_grid=None,
                occ_march: Optional[int] = None,
                occ_march_res: Optional[int] = None,
                occ_contract: bool = False,
                extras: bool = False,
                prop_params=None,
                prop_field_fn: Optional[FieldFn] = None,
                want_dist: bool = False,
                want_interlevel: bool = False,
                lindisp: bool = False,
                ):
    """Full coarse+fine march for a ray batch -> (C_coarse, C_fine), each (B,3).

    With ``extras=True`` (implies the twolist merge; grad-free eval use)
    returns ``(C_coarse, C_fine, depth, acc)`` where depth (B,) is the
    expected termination distance ``sum w_i t_i / sum w_i`` over the merged
    sample set and acc (B,) the accumulated opacity — standard NeRF
    diagnostics the reference does not produce.

    Entirely on device inside one traced graph — no host sync anywhere
    (the reference crosses the device boundary 3x per iteration, SURVEY §3.2).

    ``lindisp=True`` (opt-in, ``LINDISP``; the reference has no analog)
    spaces the coarse march linearly in disparity for unbounded depth
    ranges, with per-bin densities and resampler slopes replacing the
    uniform-spacing quirks (both quirks are properties of the t-linear
    march). Pairs with the mip-360 scene contraction (``CONTRACT``,
    core/contract.py), which wraps the field itself.

    ``ndc_params=(height, width, focal)`` enables the NDC frustum warp for
    forward-facing scenes (an opt-in capability the reference lacks,
    SURVEY.md Q10/D1): rays are shifted to the near plane, warped into the
    [-1,1]^3 cube, and marched with t in [0, 1].

    ``merge_impl`` picks the (numerically equivalent) combined-pass
    implementation: "permute" (stable-rank one-hot permutation — cheaper
    VJP, used for training) or "twolist" (sort-free two-sorted-lists merge —
    cheaper forward, used for grad-free rendering).

    ``white_bkgd`` adds the standard NeRF white-background term
    ``C += (1 - sum_i w_i)`` — an opt-in upgrade the reference lacks: without
    it, white-composited Blender scenes force the network to fabricate
    white-emitting density along empty rays, which projects as floaters from
    novel views (SURVEY.md §2.7 notes the absence).

    ``prop_params`` (opt-in, PROPOSAL config): evaluate the COARSE pass with
    the narrow proposal field (``core/proposal.py``) instead of the shared
    reference network, and composite the fine pass STANDALONE over the
    ``n_fine`` resampled samples (mip-NeRF-360-style). Two deliberate
    deviations from the reference semantics in this opt-in mode, both
    standard proposal-network practice and both REQUIRED for stability
    (measured: the Q8 gradient leak + cross-net merged composite let the
    fine loss zero out the proposal's sigma — a 20k-iter TPU run collapsed
    from loss 404 to ~3000 between iters 2k-5k):
    - the resampler CDF is stop-gradient'd, so the proposal trains ONLY on
      its own coarse RGB loss (exactly original NeRF's detached
      ``sample_pdf``; the reference leaks gradients (Q8) but shares ONE net
      between the passes, where the leak is harmless);
    - C_fine integrates just the fine samples — proposal-valued coarse
      samples do not enter the final image, so the proposal's capacity
      bounds sample PLACEMENT, never rendered quality.
    """
    if lindisp and ndc_params is not None:
        raise ValueError(
            "LINDISP is incompatible with NDC: the NDC march runs t in "
            "[0, 1] with near = 0, where disparity (1/t) diverges. Use one "
            "or the other (both exist for the same forward-facing/unbounded "
            "problem).")
    if (want_dist or want_interlevel) and prop_params is None:
        raise ValueError(
            "DIST_LOSS / PROP_INTERLEVEL require PROPOSAL=True: both are "
            "defined on the standalone fine-pass weights (and the proposal "
            "histogram), which only exist under the proposal composite")
    if prop_params is not None:
        if n_fine == 0:
            raise ValueError(
                "PROPOSAL with N_FINE=0 would train/render ONLY the narrow "
                "proposal net (the main network never evaluates) — use "
                "PROPOSAL=False for coarse-only runs.")
        if (want_dist or want_interlevel) and extras:
            raise ValueError("aux losses and extras are mutually exclusive")
        if compat_sort:
            raise ValueError(
                "PROPOSAL is incompatible with COMPAT_SORT: the proposal "
                "mode composites the fine pass standalone, so the "
                "reference's Q4 per-channel sort defect cannot be "
                "reproduced under it. Use PROPOSAL=False for parity "
                "experiments.")
    origins, dirs, near, far = raylib.pixels_to_rays(rows, cols, pose17, k_inv)
    if occ_grid is not None and ndc_params is None:
        # empty-space skipping: concentrate the (static) sample budget on the
        # occupied sub-interval of each ray (tinynerf/core/occupancy.py)
        from tinynerf.core.occupancy import tighten_bounds
        # occ_contract: the grid's cells live in the contracted ball
        # (CONTRACT scenes); the probe march is disparity-spaced whenever
        # the sampling is (lindisp), keeping contracted-radial probe
        # spacing uniform
        near, far = tighten_bounds(occ_grid, origins, dirs, near, far,
                                   n_steps=occ_march,
                                   contract=occ_contract, lindisp=lindisp,
                                   march_res=occ_march_res)
    if ndc_params is not None:
        ndc_h, ndc_w, ndc_f = ndc_params
        origins, dirs = raylib.ndc_rays(ndc_h, ndc_w, ndc_f, 1.0,
                                        origins, dirs)
        near = jnp.zeros_like(near)
        far = jnp.ones_like(far)

    # ---- EXPERIMENTAL fused path (opt-in FUSED_RENDER, default off): the
    # whole coarse -> resample -> fine -> merged-composite pipeline as ONE
    # Pallas kernel, numerically the "twolist" merge below. Measured SLOWER
    # than the per-pass kernels + XLA tail at production shapes (training
    # 35.5k vs 108.5k rays/s; 800x800 frame 4.76 s vs 1.71 s) — see
    # tinynerf/kernels/render_kernel.py for the full analysis. Gated on
    # merge_impl so an opted-in run only uses it for grad-free renders.
    fused = getattr(field_fn, "render_fused", None)
    if (fused is not None and n_fine > 0 and not compat_sort
            and merge_impl == "twolist" and not extras
            and prop_params is None and not lindisp):
        t_co = sampling.coarse_ts(near, far, n_coarse, key=key)
        return fused(params, origins, dirs, t_co, near, far, n_fine=n_fine,
                     white_bkgd=white_bkgd)
    if extras:
        merge_impl = "twolist"
    if merge_impl == "permute" and n_coarse + n_fine > 256:
        # the permute merge's rank compare-count is (B, N, N) — quadratic in
        # total samples. Past 256/ray switch to the twolist merge, whose
        # largest intermediate is the (B, N_c, N_f) cross mask; for deep
        # marches beyond THAT, shard the fine axis over the mesh
        # (SAMPLE_SHARD / parallel/sample_shard.py).
        merge_impl = "twolist"

    # ---- coarse pass (nerf.py:288-295) ----
    t_co = sampling.coarse_ts(near, far, n_coarse, key=key, lindisp=lindisp)
    if prop_params is not None:
        if prop_field_fn is None:
            from tinynerf.core.proposal import field_proposal
            prop_field_fn = field_proposal
        color_co, sigma_co = _eval_field(prop_field_fn, prop_params,
                                         origins, dirs, t_co)
    else:
        color_co, sigma_co = _eval_field(field_fn, params, origins, dirs, t_co)
    if lindisp:
        # disparity-spaced bins are non-uniform in t: use the actual forward
        # diffs (+ the house tail) instead of the reference's constant
        # (far - near) / N_c — the constant is a parity quirk of the
        # t-linear march and would mis-weight every disparity bin
        delta_co = jnp.concatenate(
            [t_co[:, 1:] - t_co[:, :-1],
             jnp.full_like(t_co[:, :1], TAIL_DELTA)], axis=1)
    else:
        delta_ray = (far - near) / n_coarse  # (B,)
        delta_co = jnp.broadcast_to(delta_ray[:, None], t_co.shape)
    dense_co = get_density(delta_co, sigma_co)
    c_coarse = composite(dense_co, color_co)
    if white_bkgd:
        c_coarse = c_coarse + (1.0 - jnp.sum(dense_co, axis=1))[:, None]

    if n_fine == 0:
        return c_coarse, c_coarse

    # ---- hierarchical fine pass (nerf.py:298-321) ----
    # the resampler's CDF slope uses the LINSPACE spacing (far-near)/(N_c-1)
    # — the reference takes ``t_coarse[0,1] - t_coarse[0,0]`` (nerf.py:234),
    # which differs from the density delta (far-near)/N_c above (a reference
    # inconsistency kept for parity; per-ray rather than ray-0 per D3)
    dense_for_cdf = (jax.lax.stop_gradient(dense_co)
                     if prop_params is not None else dense_co)
    # LINDISP bins are non-uniform in t: hand the resampler the per-bin
    # spacings so each CDF segment inverts with its own slope
    cdf_delta = (t_co[:, 1:] - t_co[:, :-1] if lindisp
                 else (far - near) / (n_coarse - 1))
    t_fi = sampling.resample(t_co, dense_for_cdf, cdf_delta, n_fine)
    color_fi, sigma_fi = _eval_field(field_fn, params, origins, dirs, t_fi)

    if prop_params is not None:
        # standalone fine composite (see the prop_params docstring note)
        delta_fi = jnp.concatenate(
            [t_fi[:, 1:] - t_fi[:, :-1],
             jnp.full_like(t_fi[:, :1], TAIL_DELTA)], axis=1)
        dense_fi = get_density(delta_fi, sigma_fi)
        c_fine = composite(dense_fi, color_fi)
        acc_fi = jnp.sum(dense_fi, axis=1)
        if white_bkgd:
            c_fine = c_fine + (1.0 - acc_fi)[:, None]
        if extras:
            depth = (jnp.sum(dense_fi * t_fi, axis=1)
                     / jnp.maximum(acc_fi, 1e-10))
            return c_coarse, c_fine, depth, acc_fi
        if want_dist or want_interlevel:
            aux = {}
            if want_dist:
                aux["dist"] = distortion_loss(t_fi, dense_fi, near, far)
            if want_interlevel:
                aux["interlevel"] = interlevel_loss(t_co, dense_co,
                                                    t_fi, dense_fi)
            return c_coarse, c_fine, aux
        return c_coarse, c_fine

    cat = lambda a, b: jnp.concatenate([a, b], axis=1)
    if compat_sort:
        # reference defect Q4: each channel sorted independently (nerf.py:308)
        sigma_all = cat(sigma_co, sigma_fi)
        t_all = jnp.sort(cat(t_co, t_fi), axis=1)
        color_s = tuple(jnp.sort(cat(c, f), axis=1)
                        for c, f in zip(color_co, color_fi))
        sigma_s = jnp.sort(sigma_all, axis=1)
        delta_all = jnp.concatenate(
            [t_all[:, 1:] - t_all[:, :-1],
             jnp.full_like(t_all[:, :1], TAIL_DELTA)], axis=1)
        dense_all = get_density(delta_all, sigma_s)
        c_fine = composite(dense_all, color_s)
    elif merge_impl == "twolist":
        # sort-free merged compositing over the two per-ray-sorted lists
        out = merged_composite(t_co, t_fi, sigma_co, sigma_fi,
                               color_co, color_fi,
                               white_bkgd=white_bkgd,
                               return_extras=extras)
        if extras:
            c_fine, depth, acc = out
            return c_coarse, c_fine, depth, acc
        c_fine = out
    else:
        t_cat, ranks = sampling.merge_sorted_ts(t_co, t_fi)
        # permute (t, r, g, b, sigma) with ONE batched one-hot matmul so the
        # channels stay coupled (Q4 fix) and the MXU does a single pass;
        # the planes stack on a LEADING axis so every one stays lane-dense
        xs = jnp.stack(
            [t_cat] + [cat(c, f) for c, f in zip(color_co, color_fi)]
            + [cat(sigma_co, sigma_fi)], axis=0)        # (5, B, N_c+N_f)
        sorted_ = sampling.apply_ranks_channels(ranks, xs)  # (B, 5, N)
        t_all = sorted_[:, 0, :]
        color_s = tuple(sorted_[:, 1 + c, :] for c in range(3))
        sigma_s = sorted_[:, 4, :]
        delta_all = jnp.concatenate(
            [t_all[:, 1:] - t_all[:, :-1],
             jnp.full_like(t_all[:, :1], TAIL_DELTA)], axis=1)
        dense_all = get_density(delta_all, sigma_s)
        c_fine = composite(dense_all, color_s)
        if white_bkgd:
            c_fine = c_fine + (1.0 - jnp.sum(dense_all, axis=1))[:, None]
    return c_coarse, c_fine


def ray_loss(c_coarse: jnp.ndarray, c_fine: jnp.ndarray, c_true: jnp.ndarray,
             ) -> jnp.ndarray:
    """Sum-of-squares over batch and RGB for both passes (``nerf.py:325-331``)."""
    return (jnp.sum(jnp.square(c_coarse - c_true))
            + jnp.sum(jnp.square(c_fine - c_true)))


def distortion_loss(t: jnp.ndarray, weights: jnp.ndarray,
                    near: jnp.ndarray, far: jnp.ndarray) -> jnp.ndarray:
    """Per-ray mip-NeRF-360 distortion regularizer (Barron et al. 2022,
    Eq. 15), point-sample form — an opt-in anti-floater quality knob
    (``DIST_LOSS``; the reference has no regularizers at all). Penalizes
    compositing weight that is spread along the ray instead of concentrated
    at one surface:

        L = sum_{i,j} w_i w_j |s_i - s_j|  +  (1/3) sum_i w_i^2 ds_i

    with ``s`` the march coordinate normalized to [0, 1] by the per-ray
    near/far (so the penalty is scene-scale-free; under NDC near/far are
    already 0/1).

    TPU-native evaluation: the naive pairwise term is a (B, N, N) tensor —
    268 MB at production shapes. Because ``t`` is sorted per ray (resampled
    CDF levels are monotone), the identity

        sum_{i,j} w_i w_j |s_i - s_j| = 2 sum_i w_i (s_i W<_i - (sW)<_i)

    with exclusive prefix sums ``W<``/``(sW)<`` evaluates it in O(N) memory,
    and the prefix sums run as triangular matmuls on the MXU
    (``sampling.matmul_cumsum``, the house cumsum — its VJP is one
    transposed matmul). Returns the (B,) per-ray loss."""
    span = jnp.maximum(far - near, 1e-10)
    s = (t - near[:, None]) / span[:, None]
    ds = jnp.concatenate(
        [s[:, 1:] - s[:, :-1], jnp.zeros_like(s[:, :1])], axis=1)
    w = weights
    # exclusive prefix sums: inclusive (triangular matmul) minus self
    cw = sampling.matmul_cumsum(w) - w
    csw = sampling.matmul_cumsum(w * s) - w * s
    pairwise = 2.0 * jnp.sum(w * (s * cw - csw), axis=1)
    intra = jnp.sum(jnp.square(w) * ds, axis=1) / 3.0
    return pairwise + intra


def interlevel_loss(t_prop: jnp.ndarray, w_prop: jnp.ndarray,
                    t_fine: jnp.ndarray, w_fine: jnp.ndarray) -> jnp.ndarray:
    """Per-ray mip-NeRF-360 interlevel (proposal) loss (Barron et al. 2022,
    Eq. 13-14), opt-in via ``PROP_INTERLEVEL``: penalizes the proposal
    histogram wherever it UNDER-covers the fine-pass weights,

        L = sum_i relu(w_i - outer_i)^2 / (w_i + eps)

    where ``outer_i`` is the total proposal mass of every proposal interval
    overlapping fine interval ``i``, and ``w_i`` is stop-gradient'd — the
    loss trains the PROPOSAL only (the fine field never sees it), exactly
    the asymmetry of the paper. Intervals derive from consecutive sample
    positions with the compositor's own tail convention (``TAIL_DELTA``),
    matching the histograms the weights were computed over.

    TPU-native: the interval-overlap test is a broadcasted compare whose
    (B, N_f, N_c) mask feeds one batched matmul (``outer = mask @ w_prop``)
    — the same compare+mask-matmul shape as ``merged_composite``'s
    cross-list prefix mass; no searchsorted/gather anywhere."""
    hi = lambda t: jnp.concatenate(
        [t[:, 1:], t[:, -1:] + TAIL_DELTA], axis=1)
    p_lo, p_hi = t_prop, hi(t_prop)
    f_lo, f_hi = t_fine, hi(t_fine)
    w_fine = jax.lax.stop_gradient(w_fine)
    mask = jnp.logical_and(
        p_hi[:, None, :] > f_lo[:, :, None],
        p_lo[:, None, :] < f_hi[:, :, None]).astype(w_prop.dtype)
    outer = jnp.einsum("bij,bj->bi", mask, w_prop,
                       precision=jax.lax.Precision.HIGHEST)
    excess = jax.nn.relu(w_fine - outer)
    return jnp.sum(excess * excess / (w_fine + 1e-7), axis=1)
