"""Fully-fused volume renderer: the whole coarse->fine pipeline in Pallas.

STATUS: a complete, correct, **measured-slower** experiment — opt-in via
``FUSED_RENDER = True``, default OFF. The hypothesis (round-2 roadmap) was
that fusing the renderer tail into the MLP kernels would delete the XLA
tail segments + dispatch gaps. The measurements on v5e (64+128 samples,
bf16, production shapes) refuted it:

- training: **35.5k rays/s fused vs 108.5k** with per-pass kernels + XLA
  permute-merge tail;
- 800x800 frame render: **4.76 s fused vs 1.71 s** unfused (one kernel
  call over all 640k rays vs lax.map over 4096-ray chunks).

Root cause: the tail math (triangular-matmul cumsums, one-hot resampler
sums, cross-list merge masks) runs here on (8, N) ray tiles — tiny MXU
shapes serialized across the grid — while XLA runs the same equations
batch-wide at (B, N) with full overlap. The per-pass kernels sit at
86-100% of the measured matmul roofline, so the headroom the fusion chased
(~7 ms/step of tail + gaps) was smaller than what tile-serializing the
tail costs (~75 ms/step). Kept because the kernel is a working reference
for whole-pipeline Pallas fusion (custom-VJP through a resampler, VMEM-
budget splitting, lane-dense cross-kernel hand-offs) and the measurement
is load-bearing for the architecture: it justifies WHY the production path
keeps the tail in XLA.

This module implements the ENTIRE per-ray renderer (reference
``nerf.py:263-323`` semantics, SURVEY.md §2.7-2.8) as:

- ``_fwd_kernel``: coarse MLP -> inclusive-cumsum density -> composite ->
  inverse-CDF resample -> fine MLP -> sort-free merged composite, all in
  VMEM per ray tile. HBM sees 10 floats in, 6 out, per ray.
- ``_bwd_fine_kernel`` + ``_bwd_coarse_kernel``: recompute the forward per
  tile and hand-backpropagate the tail (merge -> fine MLP -> resampler ->
  density, then the coarse MLP chain in the second kernel), accumulating
  weight gradients across grid steps. The split keeps one activation set
  live per kernel (a single-kernel backward exceeds Mosaic's VMEM stack);
  the hand-off is 4 lane-dense (B, N_c) arrays. Ray geometry
  (origins/dirs/t_coarse/near/far) is training DATA — no cotangents are
  produced for it, which also deletes the old kernels' per-sample
  d(points)/d(dirs) work for the coarse pass.

Gradient semantics match the autodiff of ``render.render_rays`` with the
``twolist`` merge (mathematically identical to the training ``permute``
merge): CDF levels are detached (reference computes them on the host,
``nerf.py:240-246``), gradients flow into coarse sigma through the gathered
CDF/slope (Q8), and fine-loss gradients reach the resampled t's through the
fine MLP's d_ts.

Layout notes (Mosaic): per-ray arrays are (T, N) lane-major; (T, N_c, N_f)
masks live only in VMEM; lanes->sublanes reshapes are unsupported, so the
sigma head's (T, N) cotangent enters the rows-major gradient chain through an
outer-product bridge ``(G[:, :, None] * wsig^T).reshape(rows, W)`` and its
weight gradient accumulates in transposed (1, W) layout (transposed back
outside the kernel).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynerf.core.encoding import L_DIR, L_POINT
from tinynerf.kernels import mlp_kernel as mk
from tinynerf.kernels.mlp_kernel import (_B_NAMES, _DIR_SEL, _POINT_SEL,
                                         _W_NAMES, _encode, _expand_rays,
                                         _flops_per_row, _forward_tile,
                                         _unpack_grads, pack_params)

TAIL_DELTA = 1e-4   # reference `last` (nerf.py:286)
EPSILON = 1e-7      # reference slope epsilon (nerf.py:239)
_BIG = 3.0e38       # +inf stand-in (finite: BIG - t stays finite in where())
_BIG_CUT = 1.0e38


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last axis as a triangular MXU matmul
    (tinynerf.core.sampling.matmul_cumsum, in-kernel)."""
    n = x.shape[-1]
    tri = (_iota((n, n), 0) <= _iota((n, n), 1)).astype(x.dtype)
    return jax.lax.dot_general(x, tri, (((x.ndim - 1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def _revsum(g: jnp.ndarray) -> jnp.ndarray:
    """Transpose of the inclusive cumsum: out_i = sum_{n >= i} g_n."""
    n = g.shape[-1]
    tri = (_iota((n, n), 0) >= _iota((n, n), 1)).astype(g.dtype)
    return jax.lax.dot_general(g, tri, (((g.ndim - 1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def _shift_down(x: jnp.ndarray) -> jnp.ndarray:
    """x[:, n] -> x[:, n+1] value at n (i.e. next element), last = 0."""
    n = x.shape[1]
    rolled = pltpu.roll(x, shift=n - 1, axis=1)
    return jnp.where(_iota(x.shape, 1) == n - 1, 0.0, rolled)


def _shift_up(x: jnp.ndarray) -> jnp.ndarray:
    """x[:, n] -> value moves to slot n+1, slot 0 = 0 (transpose of above)."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    return jnp.where(_iota(x.shape, 1) == 0, 0.0, rolled)


# ----------------------------------------------------------------------------
# renderer tail math, (T, N)-shaped f32 throughout
# ----------------------------------------------------------------------------


def _density_fwd(sd: jnp.ndarray):
    """Reference inclusive-cumsum weights (nerf.py:263-272). sd = sigma*delta
    (T, N) -> (weights, exp(-cumsum)) each (T, N)."""
    e = jnp.exp(-_cumsum(sd))
    w = e * (1.0 - jnp.exp(-sd))
    return w, e


def _density_bwd(sd, e, g_w):
    """d(weights)/d(sd): local term + cumsum transpose."""
    w = e * (1.0 - jnp.exp(-sd))
    g_sd = jnp.exp(-sd) * e * g_w + _revsum(-w * g_w)
    return g_sd


def _resample_fwd(t_co, w, delta_l, n_fine):
    """Inverse-CDF resampling (reference nerf.py:225-261 semantics, on-chip).

    t_co (T, N_c), w (T, N_c) coarse weights, delta_l (T, 1) linspace
    spacing. Returns (t_fi (T, N_f), saved intermediates for bwd).

    Mosaic note: every 3-D reduction here keeps the reduced index on the
    LANE (last) axis — middle-axis ``vector.multi_reduction`` is rejected
    by the compiler ("unsupported output implicit dimension").
    """
    nc = t_co.shape[1]
    cdf = _cumsum(w)                                    # nondecreasing
    low = jax.lax.stop_gradient(cdf[:, 0:1])
    high = jax.lax.stop_gradient(cdf[:, nc - 1:nc])
    frac = (_iota((1, n_fine), 1).astype(jnp.float32) + 1.0) / (n_fine + 1.0)
    u = low + (high - low) * frac                       # (T, N_f), detached

    cnt = jnp.sum((cdf[:, None, :] < u[:, :, None]).astype(jnp.int32), axis=2)
    idx = jnp.clip(cnt - 1, 0, nc - 1)                  # (T, N_f)
    w_next = _shift_down(w)
    slope = jnp.where(_iota(w.shape, 1) == nc - 1, 0.0,
                      delta_l / (w_next + EPSILON))     # (T, N_c)

    onehot = (idx[:, :, None] == _iota((1, 1, nc), 2)).astype(jnp.float32)
    t_lo = jnp.sum(onehot * t_co[:, None, :], axis=2)
    c_lo = jnp.sum(onehot * cdf[:, None, :], axis=2)
    s_lo = jnp.sum(onehot * slope[:, None, :], axis=2)
    t_fi = t_lo + (u - c_lo) * s_lo
    return t_fi, (cdf, u, idx, slope, w_next, c_lo, s_lo, delta_l)


def _resample_bwd(res, g_tfi):
    """d(t_fi)/d(coarse weights): through the gathered cdf and slope (Q8;
    levels u are detached). Returns g_w (T, N_c)."""
    cdf, u, idx, slope, w_next, c_lo, s_lo, delta_l = res
    g_clo = -s_lo * g_tfi                               # (T, N_f)
    g_slo = (u - c_lo) * g_tfi
    # transposed one-hot (T, N_c, N_f): scatter-free accumulation with the
    # fine index m on the lane axis
    nc = cdf.shape[1]
    oh2 = (idx[:, None, :] == _iota((1, nc, 1), 1)).astype(jnp.float32)
    g_cdf = jnp.sum(oh2 * g_clo[:, None, :], axis=2)    # (T, N_c)
    g_slope = jnp.sum(oh2 * g_slo[:, None, :], axis=2)
    # slope_n = delta_l / (w_{n+1} + eps), last slope is the constant 0
    g_wnext = jnp.where(_iota(cdf.shape, 1) == nc - 1, 0.0,
                        -delta_l / jnp.square(w_next + EPSILON) * g_slope)
    g_w = _shift_up(g_wnext) + _revsum(g_cdf)
    return g_w


def _merge_fwd(t_co, t_fi, sigma_co, sigma_fi, color_co3, color_fi3,
               white_bkgd):
    """Sort-free merged compositing over the two per-ray-sorted sample lists
    (render.merged_composite, in-kernel). Returns (c_fi (T, 3), saved)."""
    nc, nf = t_co.shape[1], t_fi.shape[1]
    # TWO orientations of the one cross-compare mask, so every 3-D reduction
    # keeps its reduced index on the lane axis (Mosaic rejects middle-axis
    # multi_reductions): `fewer` (T, N_c, N_f) reduces over fine samples,
    # `fewer2` (T, N_f, N_c) over coarse samples. fewer2[t,j,i] == fewer[t,i,j].
    fewer = (t_fi[:, None, :] < t_co[:, :, None])
    fewer_f = fewer.astype(jnp.float32)
    fewer2 = (t_fi[:, :, None] < t_co[:, None, :])

    own_next_co = jnp.where(_iota(t_co.shape, 1) == nc - 1, _BIG,
                            pltpu.roll(t_co, shift=nc - 1, axis=1))
    cand_co = jnp.min(jnp.where(fewer, _BIG, t_fi[:, None, :]), axis=2)
    next_co = jnp.minimum(own_next_co, cand_co)
    delta_co = jnp.where(next_co >= _BIG_CUT, TAIL_DELTA, next_co - t_co)

    own_next_fi = jnp.where(_iota(t_fi.shape, 1) == nf - 1, _BIG,
                            pltpu.roll(t_fi, shift=nf - 1, axis=1))
    cand_fi = jnp.min(jnp.where(fewer2, t_co[:, None, :], _BIG), axis=2)
    next_fi = jnp.minimum(own_next_fi, cand_fi)
    delta_fi = jnp.where(next_fi >= _BIG_CUT, TAIL_DELTA, next_fi - t_fi)

    sd_co = sigma_co * delta_co
    sd_fi = sigma_fi * delta_fi
    a_co = _cumsum(sd_co) + jnp.sum(fewer_f * sd_fi[:, None, :], axis=2)
    a_fi = _cumsum(sd_fi) + jnp.sum(
        jnp.where(fewer2, 0.0, sd_co[:, None, :]), axis=2)
    e_co, e_fi = jnp.exp(-a_co), jnp.exp(-a_fi)
    w_co = e_co * (1.0 - jnp.exp(-sd_co))
    w_fi = e_fi * (1.0 - jnp.exp(-sd_fi))
    c_fi = (jnp.sum(w_co[:, :, None] * color_co3, axis=1)
            + jnp.sum(w_fi[:, :, None] * color_fi3, axis=1))
    if white_bkgd:
        c_fi = c_fi + (1.0 - jnp.sum(w_co, axis=1)
                       - jnp.sum(w_fi, axis=1))[:, None]
    saved = (fewer_f, fewer2, own_next_co, cand_co, next_co, delta_co,
             own_next_fi, cand_fi, next_fi, delta_fi,
             sd_co, sd_fi, e_co, e_fi, w_co, w_fi)
    return c_fi, saved


def _merge_bwd(saved, t_fi, sigma_co, sigma_fi, color_co3, color_fi3,
               g_cfi, white_bkgd):
    """Backward of :func:`_merge_fwd` given g(c_fi) (T, 3).

    Returns (g_rgb_co (T,N_c,3), g_rgb_fi (T,N_f,3), g_sigma_co (T,N_c),
    g_sigma_fi (T,N_f), g_tfi (T,N_f)). Gradients into t_co are dropped —
    coarse sample positions are functions of ray data only. Min-ties follow
    a deterministic own-side-wins / split-among-argmins convention (ties are
    measure-zero in training)."""
    (fewer_f, fewer2, own_next_co, cand_co, next_co, delta_co,
     own_next_fi, cand_fi, next_fi, delta_fi,
     sd_co, sd_fi, e_co, e_fi, w_co, w_fi) = saved

    g_rgb_co = w_co[:, :, None] * g_cfi[:, None, :]
    g_rgb_fi = w_fi[:, :, None] * g_cfi[:, None, :]
    g_wco = jnp.sum(color_co3 * g_cfi[:, None, :], axis=2)
    g_wfi = jnp.sum(color_fi3 * g_cfi[:, None, :], axis=2)
    if white_bkgd:
        gsum = jnp.sum(g_cfi, axis=1)[:, None]
        g_wco = g_wco - gsum
        g_wfi = g_wfi - gsum

    g_aco = -w_co * g_wco
    g_afi = -w_fi * g_wfi
    g_sdco = jnp.exp(-sd_co) * e_co * g_wco + _revsum(g_aco)
    g_sdfi = jnp.exp(-sd_fi) * e_fi * g_wfi + _revsum(g_afi)
    # cross-prefix transposes: a_co picks up every earlier fine sd and v.v.
    # (lane-axis reductions via the two mask orientations)
    g_sdfi = g_sdfi + jnp.sum(
        jnp.where(fewer2, g_aco[:, None, :], 0.0), axis=2)
    g_sdco = g_sdco + jnp.sum((1.0 - fewer_f) * g_afi[:, None, :], axis=2)

    g_sigma_co = delta_co * g_sdco
    g_sigma_fi = delta_fi * g_sdfi
    g_dco = sigma_co * g_sdco
    g_dfi = sigma_fi * g_sdfi

    # delta_fi = next_fi - t_fi (when a successor exists)
    valid_fi = (next_fi < _BIG_CUT).astype(jnp.float32)
    g_next_fi = valid_fi * g_dfi
    g_tfi = -valid_fi * g_dfi
    # next_fi = min(own t_fi[j+1], coarse candidate): own side wins ties and
    # keeps the gradient; the coarse side is data.
    own_sel_fi = (own_next_fi <= cand_fi).astype(jnp.float32)
    g_tfi = g_tfi + _shift_up(own_sel_fi * g_next_fi)

    # next_co = min(own t_co[i+1] (data), fine candidate): the fine candidate
    # is the min over unmasked t_fi — distribute among argmins.
    valid_co = (next_co < _BIG_CUT).astype(jnp.float32)
    g_next_co = valid_co * g_dco
    cand_sel_co = (cand_co < own_next_co).astype(jnp.float32)
    g_cand_co = cand_sel_co * g_next_co                  # (T, N_c)
    masked_fi = jnp.where(fewer_f > 0.0, _BIG, t_fi[:, None, :])
    argmin = (masked_fi == cand_co[:, :, None]).astype(jnp.float32)
    counts = jnp.sum(argmin, axis=2)
    share = jnp.where(counts > 0.0, g_cand_co / jnp.maximum(counts, 1.0), 0.0)
    # distribute in the (T, N_f, N_c) orientation (lane-axis reduction)
    masked2 = jnp.where(fewer2, _BIG, t_fi[:, :, None])
    argmin2 = (masked2 == cand_co[:, None, :]).astype(jnp.float32)
    g_tfi = g_tfi + jnp.sum(argmin2 * share[:, None, :], axis=2)

    return g_rgb_co, g_rgb_fi, g_sigma_co, g_sigma_fi, g_tfi


# ----------------------------------------------------------------------------
# gradient chain through the MLP for one row set (precomputed activations)
# ----------------------------------------------------------------------------


def _grad_chain(w, enc_pt, enc_dir, fwd_state, g_rgb_rows, g_sig2d,
                sigma_pre2d, dw, db, dbsigT, dtype, need_dts, d_rays=None,
                t2d=None):
    """Backpropagate one row set (T*N rows) through heads + trunk, given the
    tile's precomputed forward state. Mirrors ``mlp_kernel._bwd_core`` but:

    - activations come in precomputed (no second recompute per chain);
    - the sigma cotangent arrives in per-ray (T, N) layout and enters the
      rows-major chain via the outer-product bridge (lanes->sublanes
      reshapes are unsupported by Mosaic); its weight grad accumulates in
      transposed (1, W) layout (``dbsigT``/``dw['wsigT']``);
    - with ``need_dts`` the per-sample t gradient (T, N) is returned
      (chain rule through pts = o + t*d), else coordinate grads are skipped
      entirely (coarse pass: sample positions are data).
    """
    color, sigma_pre, point_info, hd, hd_mask, acts, masks = fwd_state
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    cast = lambda x: x.astype(dtype)
    dT = lambda a, gg: jax.lax.dot_general(
        a, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    mmT = lambda gg, ww: jax.lax.dot_general(
        gg, ww, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    fsum = lambda x: jnp.sum(x, axis=0, dtype=jnp.float32)

    t_rays, n = g_sig2d.shape
    rows = t_rays * n

    # ---- heads ----
    g_col_pre = cast(g_rgb_rows * color * (1.0 - color))
    dw["wcol"][:] += dT(hd, g_col_pre)
    db["bcol"][:] += fsum(g_col_pre)

    g_hd = cast(mmT(g_col_pre, w["wcol"]) * hd_mask)
    dw["wde"][:] += dT(enc_dir, g_hd)
    dw["wdp"][:] += dT(point_info, g_hd)
    db["bd"][:] += fsum(g_hd)
    # (no g_enc_dir: directions are per-ray data — t only moves the points)
    g_pi = cast(mmT(g_hd, w["wdp"]))

    # sigma head via the (T, N) bridge
    gs = g_sig2d * jnp.sign(sigma_pre2d)                # (T, N) f32
    h7 = acts[7]
    h7_3d = h7.reshape(t_rays, n, h7.shape[1])
    dw["wsigT"][:] += jnp.sum(
        h7_3d.astype(jnp.float32) * gs[:, :, None], axis=(0, 1),
        dtype=jnp.float32).reshape(1, -1)
    dbsigT[:] += jnp.sum(jnp.sum(gs, axis=1, keepdims=True), axis=0,
                         keepdims=True)  # (1, 1) without a 0-D intermediate
    dw["wpi"][:] += dT(h7, g_pi)
    db["bpi"][:] += fsum(g_pi)

    wsigT = w["wsigT"].astype(jnp.float32)              # (1, W)
    g_h = (mmT(g_pi, w["wpi"])
           + (gs[:, :, None] * wsigT[None, :, :]).reshape(rows, -1))

    # ---- trunk 7..5 ----
    for i in (7, 6, 5):
        g_pre = cast(g_h * masks[i])
        dw[f"w{i}"][:] += dT(acts[i - 1], g_pre)
        db[f"b{i}"][:] += fsum(g_pre)
        g_h = mmT(g_pre, w[f"w{i}"])

    # ---- skip layer 4 ----
    g_pre4 = cast(g_h * masks[4])
    dw["w4h"][:] += dT(acts[3], g_pre4)
    dw["w4e"][:] += dT(enc_pt, g_pre4)
    db["b4"][:] += fsum(g_pre4)
    g_h = mmT(g_pre4, w["w4h"])
    g_enc_pt = mmT(g_pre4, w["w4e"]) if need_dts else None

    # ---- trunk 3..1 ----
    for i in (3, 2, 1):
        g_pre = cast(g_h * masks[i])
        dw[f"w{i}"][:] += dT(acts[i - 1], g_pre)
        db[f"b{i}"][:] += fsum(g_pre)
        g_h = mmT(g_pre, w[f"w{i}"])

    # ---- layer 0 ----
    g_pre0 = cast(g_h * masks[0])
    dw["w0"][:] += dT(enc_pt, g_pre0)
    db["b0"][:] += fsum(g_pre0)
    if not need_dts:
        return None
    g_enc_pt = g_enc_pt + mmT(g_pre0, w["w0"])

    # ---- encoding -> d(points) -> d(t) ----
    ptsel, dirsel = w["_ptsel"], w["_dirsel"]
    scaled_pt = mk._scaled_coords(w["_pts"], ptsel)
    L3p = 3 * L_POINT
    g_scaled_pt = (g_enc_pt[:, :L3p] * jnp.cos(scaled_pt)
                   - g_enc_pt[:, L3p:] * jnp.sin(scaled_pt))
    d_pts = jax.lax.dot_general(
        g_scaled_pt, ptsel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # (rows, 3)
    # dirs enter the field too, but only their broadcast copies — t affects
    # pts alone: d_ts = d_pts . d
    d_pts3 = d_pts.reshape(t_rays, n, 3)
    return jnp.sum(d_pts3 * d_rays[:, None, :], axis=2)  # (T, N)


# ----------------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------------


def _coarse_quants(nf2, t_co, sigma_co, n_coarse):
    near, far = nf2[:, 0:1], nf2[:, 1:2]
    delta_c = (far - near) / n_coarse                   # (T, 1)
    sd = delta_c * sigma_co
    delta_l = (far - near) / (n_coarse - 1)
    return sd, delta_l


def _fwd_kernel(*refs, n_fine, white_bkgd, dtype):
    o_ref, d_ref, tco_ref, nf_ref, ptsel_ref, dirsel_ref = refs[:6]
    w = {name: refs[6 + i][:] for i, name in enumerate(_W_NAMES)}
    b = {name: refs[6 + len(_W_NAMES) + i][:]
         for i, name in enumerate(_B_NAMES)}
    w.update(b)
    cco_ref, cfi_ref = refs[-2], refs[-1]

    o, d, t_co, nf2 = o_ref[:], d_ref[:], tco_ref[:], nf_ref[:]
    t, nc = t_co.shape
    ptsel, dirsel = ptsel_ref[:], dirsel_ref[:]

    # ---- coarse field ----
    pts, dirb = _expand_rays(o, d, t_co)
    color_c, sig_pre_c = _forward_tile(
        w, _encode(pts, ptsel, dtype), _encode(dirb, dirsel, dtype), dtype)
    sigma_co = jnp.abs(sig_pre_c).reshape(t, nc)
    color_co3 = color_c.reshape(t, nc, 3)

    # ---- density + coarse composite (nerf.py:263-295) ----
    sd, delta_l = _coarse_quants(nf2, t_co, sigma_co, nc)
    w_co, _ = _density_fwd(sd)
    c_co = jnp.sum(w_co[:, :, None] * color_co3, axis=1)
    if white_bkgd:
        c_co = c_co + (1.0 - jnp.sum(w_co, axis=1))[:, None]

    # ---- resample + fine field (nerf.py:225-261, 298-321) ----
    t_fi, _ = _resample_fwd(t_co, w_co, delta_l, n_fine)
    pts_f, dirb_f = _expand_rays(o, d, t_fi)
    color_f, sig_pre_f = _forward_tile(
        w, _encode(pts_f, ptsel, dtype), _encode(dirb_f, dirsel, dtype), dtype)
    sigma_fi = jnp.abs(sig_pre_f).reshape(t, n_fine)
    color_fi3 = color_f.reshape(t, n_fine, 3)

    c_fi, _ = _merge_fwd(t_co, t_fi, sigma_co, sigma_fi, color_co3,
                         color_fi3, white_bkgd)
    cco_ref[:] = c_co
    cfi_ref[:] = c_fi


def _unpack_bwd_refs(refs, n_inputs):
    """Common ref layout for both backward kernels: the first ``n_inputs``
    refs are kernel-specific inputs, then selector matrices, wsigT, weights,
    biases, then the gradient-accumulator outputs."""
    ptsel_ref, dirsel_ref, wsigT_ref = refs[n_inputs:n_inputs + 3]
    base = n_inputs + 3
    w = {name: refs[base + i][:] for i, name in enumerate(_W_NAMES)}
    b = {name: refs[base + len(_W_NAMES) + i][:]
         for i, name in enumerate(_B_NAMES)}
    w.update(b)
    w["wsigT"] = wsigT_ref[:]
    n_in = base + len(_W_NAMES) + len(_B_NAMES)
    out_names = [n for n in _W_NAMES if n != "wsig"] + ["wsigT"]
    dw = {name: refs[n_in + i] for i, name in enumerate(out_names)}
    bias_names = [n for n in _B_NAMES if n != "bsig"]
    db = {name: refs[n_in + len(out_names) + i]
          for i, name in enumerate(bias_names)}
    dbsigT = refs[n_in + len(out_names) + len(bias_names)]
    rest = refs[n_in + len(out_names) + len(bias_names) + 1:]
    return ptsel_ref[:], dirsel_ref[:], w, dw, db, dbsigT, rest


def _init_accumulators(dw, db, dbsigT):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in list(dw.values()) + list(db.values()) + [dbsigT]:
            r[:] = jnp.zeros_like(r)


def _bwd_fine_kernel(*refs, n_fine, white_bkgd, dtype):
    """Backward part 1 (fine side). Recomputes the coarse forward WITHOUT
    activations (transient — only sigma/color are needed for the tail), the
    tail, and the fine forward WITH activations; backpropagates merge ->
    fine MLP -> resampler -> density. Emits the full per-ray cotangent state
    the coarse chain needs — all in lane-dense (T, N_c) layout:

    - ``g_sig_co`` total sigma cotangent (merge + density paths);
    - ``wc_cco`` / ``wc_cfi``: the coarse rgb cotangent is rank-1 per
      channel, ``g_rgb_co3 = wc_cco ⊗ g_cco + wc_cfi ⊗ g_cfi`` (coarse
      composite weights / merged composite weights) — crossing the two
      (T, N_c) coefficient arrays instead of a (T, N_c, 3) tensor keeps
      the HBM hand-off 128-lane dense ((R, 3) arrays tile at 3/128).

    Splitting the backward this way (vs one kernel doing both grad chains)
    keeps only ONE activation set live at a time — the single-kernel variant
    runs out of VMEM stack at Mosaic compile time.
    """
    (o_ref, d_ref, tco_ref, nf_ref, gco_ref, gfi_ref) = refs[:6]
    ptsel, dirsel, w, dw, db, dbsigT, rest = _unpack_bwd_refs(refs, 6)
    gsig_ref, wcco_ref, wcfi_ref = rest
    _init_accumulators(dw, db, dbsigT)

    o, d, t_co, nf2 = o_ref[:], d_ref[:], tco_ref[:], nf_ref[:]
    g_cco, g_cfi = gco_ref[:], gfi_ref[:]
    t, nc = t_co.shape

    # ---- coarse forward, transient (no kept activations) ----
    pts, dirb = _expand_rays(o, d, t_co)
    color_c, sig_pre_c = _forward_tile(
        w, _encode(pts, ptsel, dtype), _encode(dirb, dirsel, dtype), dtype)
    sigma_co = jnp.abs(sig_pre_c).reshape(t, nc)
    color_co3 = color_c.reshape(t, nc, 3)

    # ---- tail forward ----
    sd, delta_l = _coarse_quants(nf2, t_co, sigma_co, nc)
    w_co, e_co = _density_fwd(sd)
    t_fi, res_saved = _resample_fwd(t_co, w_co, delta_l, n_fine)

    pts_f, dirb_f = _expand_rays(o, d, t_fi)
    enc_pt_f = _encode(pts_f, ptsel, dtype)
    enc_dir_f = _encode(dirb_f, dirsel, dtype)
    state_f = _forward_tile(w, enc_pt_f, enc_dir_f, dtype, keep_acts=True)
    sig_pre_f2d = state_f[1].reshape(t, n_fine)
    sigma_fi = jnp.abs(sig_pre_f2d)
    color_fi3 = state_f[0].reshape(t, n_fine, 3)

    _, merge_saved = _merge_fwd(t_co, t_fi, sigma_co, sigma_fi, color_co3,
                                color_fi3, white_bkgd)
    w_co_merge = merge_saved[14]                        # (T, N_c)

    # ---- merged composite backward ----
    (_g_rgb_co3, g_rgb_fi3, g_sig_co, g_sig_fi,
     g_tfi) = _merge_bwd(merge_saved, t_fi, sigma_co, sigma_fi, color_co3,
                         color_fi3, g_cfi, white_bkgd)

    # ---- fine MLP backward (needs d_ts for the resampler path) ----
    w["_ptsel"], w["_dirsel"], w["_pts"] = ptsel, dirsel, pts_f
    d_ts_fi = _grad_chain(w, enc_pt_f, enc_dir_f, state_f,
                          g_rgb_fi3.reshape(t * n_fine, 3), g_sig_fi,
                          sig_pre_f2d, dw, db, dbsigT, dtype,
                          need_dts=True, d_rays=d)
    g_tfi = g_tfi + d_ts_fi

    # ---- resampler + density + coarse-composite backward ----
    g_w = _resample_bwd(res_saved, g_tfi)
    g_w = g_w + jnp.sum(color_co3 * g_cco[:, None, :], axis=2)
    if white_bkgd:
        g_w = g_w - jnp.sum(g_cco, axis=1)[:, None]
    g_sd = _density_bwd(sd, e_co, g_w)
    delta_c = (nf2[:, 1:2] - nf2[:, 0:1]) / nc
    gsig_ref[:] = g_sig_co + delta_c * g_sd
    wcco_ref[:] = w_co
    wcfi_ref[:] = w_co_merge


def _bwd_coarse_kernel(*refs, white_bkgd, dtype):
    """Backward part 2 (coarse side): recompute the coarse forward WITH
    activations and backpropagate the per-ray cotangents from part 1 through
    the coarse MLP. Accumulates into its own grad buffers (summed with part
    1's outside). Sample positions are data: no d_ts."""
    del white_bkgd  # folded into part 1's cotangents
    (o_ref, d_ref, tco_ref, gco_ref, gfi_ref,
     gsig_ref, wcco_ref, wcfi_ref) = refs[:8]
    ptsel, dirsel, w, dw, db, dbsigT, _ = _unpack_bwd_refs(refs, 8)
    _init_accumulators(dw, db, dbsigT)

    o, d, t_co = o_ref[:], d_ref[:], tco_ref[:]
    g_cco, g_cfi = gco_ref[:], gfi_ref[:]
    g_sig_co = gsig_ref[:]
    t, nc = t_co.shape

    pts, dirb = _expand_rays(o, d, t_co)
    enc_pt_c = _encode(pts, ptsel, dtype)
    enc_dir_c = _encode(dirb, dirsel, dtype)
    state_c = _forward_tile(w, enc_pt_c, enc_dir_c, dtype, keep_acts=True)
    sig_pre_c2d = state_c[1].reshape(t, nc)

    # rebuild the rank-1-per-channel rgb cotangent in rows-major layout
    g_rgb_co3 = (wcco_ref[:][:, :, None] * g_cco[:, None, :]
                 + wcfi_ref[:][:, :, None] * g_cfi[:, None, :])

    w["_ptsel"], w["_dirsel"], w["_pts"] = ptsel, dirsel, pts
    _grad_chain(w, enc_pt_c, enc_dir_c, state_c,
                g_rgb_co3.reshape(t * nc, 3), g_sig_co, sig_pre_c2d,
                dw, db, dbsigT, dtype, need_dts=False)


# ----------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ----------------------------------------------------------------------------


def _ray_tile(n_coarse: int, n_fine: int) -> int:
    """Rays per grid step: ~1024 fine-pass rows (the measured MXU sweet
    spot), rounded to 8 sublanes."""
    rt = max(1, 1024 // max(n_fine, n_coarse))
    return max(8, ((rt + 7) // 8) * 8)


def _full(a):
    return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                        memory_space=pltpu.VMEM)


def _row_spec(cols):
    return pl.BlockSpec(cols, lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("n_fine", "white_bkgd", "compute_dtype",
                                    "tile"))
def _fused_render_forward(packed, origins, dirs, t_co, nf2, n_fine,
                          white_bkgd, compute_dtype, tile):
    b, nc = t_co.shape
    grid = (b // tile,)
    w_ops = [packed[n] for n in _W_NAMES]
    b_ops = [packed[n] for n in _B_NAMES]
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]
    n_rows = b * (nc + n_fine)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_fine=n_fine, white_bkgd=white_bkgd,
                          dtype=compute_dtype),
        grid=grid,
        in_specs=[_row_spec((tile, 3)), _row_spec((tile, 3)),
                  _row_spec((tile, nc)), _row_spec((tile, 2))]
        + [_full(a) for a in sels + w_ops + b_ops],
        out_specs=[_row_spec((tile, 3)), _row_spec((tile, 3))],
        out_shape=[jax.ShapeDtypeStruct((b, 3), jnp.float32),
                   jax.ShapeDtypeStruct((b, 3), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=_flops_per_row() * n_rows,
            bytes_accessed=b * 16 * 4 + 600_000 * 2,
            transcendentals=n_rows * (3 * (L_POINT + L_DIR) * 2 + 4)),
        # the forward needs far less VMEM than the backward; a tight limit
        # leaves XLA headroom for the fusions AROUND the call — with the
        # shared 110 MB limit, embedding this kernel in the whole-frame
        # lax.map (eval.make_frame_fn) fails VMEM stack allocation
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=mk.INTERPRET,
    )(origins, dirs, t_co, nf2, *sels, *w_ops, *b_ops)
    return outs[0], outs[1]


@functools.partial(jax.jit,
                   static_argnames=("n_fine", "white_bkgd", "compute_dtype",
                                    "tile"))
def _fused_render_backward(packed, origins, dirs, t_co, nf2, g_cco, g_cfi,
                           n_fine, white_bkgd, compute_dtype, tile):
    b, nc = t_co.shape
    grid = (b // tile,)
    w_ops = [packed[n] for n in _W_NAMES]
    b_ops = [packed[n] for n in _B_NAMES]
    wsigT = packed["wsig"].T  # (1, W) for the in-kernel layout bridge
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]
    shared_ops = sels + [wsigT] + w_ops + b_ops
    shared_specs = [_full(a) for a in shared_ops]

    out_wnames = [n for n in _W_NAMES if n != "wsig"]
    dw_shapes = [jax.ShapeDtypeStruct(packed[n].shape, jnp.float32)
                 for n in out_wnames]
    dw_shapes.append(jax.ShapeDtypeStruct(wsigT.shape, jnp.float32))
    out_bnames = [n for n in _B_NAMES if n != "bsig"]
    db_shapes = [jax.ShapeDtypeStruct(packed[n].shape, jnp.float32)
                 for n in out_bnames]
    db_shapes.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))  # bsig
    grad_shapes = dw_shapes + db_shapes
    grad_specs = [_full(s) for s in grad_shapes]

    def unpack(outs):
        dws = dict(zip(out_wnames, outs[:len(out_wnames)]))
        dws["wsig"] = outs[len(out_wnames)].T           # back to (W, 1)
        dbs = dict(zip(out_bnames,
                       outs[len(out_wnames) + 1:
                            len(out_wnames) + 1 + len(out_bnames)]))
        dbs["bsig"] = outs[len(out_wnames) + 1 + len(out_bnames)].reshape(1)
        return dws, dbs

    # ---- part 1: fine side + tail; emits per-ray coarse cotangents ----
    ray_shapes = [jax.ShapeDtypeStruct((b, nc), jnp.float32)] * 3
    n_rows_f = b * (nc + n_fine)
    outs1 = pl.pallas_call(
        functools.partial(_bwd_fine_kernel, n_fine=n_fine,
                          white_bkgd=white_bkgd, dtype=compute_dtype),
        grid=grid,
        in_specs=[_row_spec((tile, 3)), _row_spec((tile, 3)),
                  _row_spec((tile, nc)), _row_spec((tile, 2)),
                  _row_spec((tile, 3)), _row_spec((tile, 3))]
        + shared_specs,
        out_specs=grad_specs + [_row_spec((tile, nc))] * 3,
        out_shape=grad_shapes + ray_shapes,
        cost_estimate=pl.CostEstimate(
            flops=(2 * b * n_fine + b * nc) * _flops_per_row(),
            bytes_accessed=b * 22 * 4 + 600_000 * 4,
            transcendentals=n_rows_f * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=mk._VMEM_LIMIT),
        interpret=mk.INTERPRET,
    )(origins, dirs, t_co, nf2, g_cco, g_cfi, *shared_ops)
    n_grads = len(grad_shapes)
    g_sig_co, wc_cco, wc_cfi = outs1[n_grads:]

    # ---- part 2: coarse grad chain ----
    outs2 = pl.pallas_call(
        functools.partial(_bwd_coarse_kernel, white_bkgd=white_bkgd,
                          dtype=compute_dtype),
        grid=grid,
        in_specs=[_row_spec((tile, 3)), _row_spec((tile, 3)),
                  _row_spec((tile, nc)), _row_spec((tile, 3)),
                  _row_spec((tile, 3))] + [_row_spec((tile, nc))] * 3
        + shared_specs,
        out_specs=grad_specs,
        out_shape=grad_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nc * _flops_per_row(),
            bytes_accessed=b * 16 * 4 + 600_000 * 2,
            transcendentals=b * nc * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=mk._VMEM_LIMIT),
        interpret=mk.INTERPRET,
    )(origins, dirs, t_co, g_cco, g_cfi, g_sig_co, wc_cco, wc_cfi,
      *shared_ops)

    dws1, dbs1 = unpack(outs1[:n_grads])
    dws2, dbs2 = unpack(outs2)
    dws = {k: dws1[k] + dws2[k] for k in dws1}
    dbs = {k: dbs1[k] + dbs2[k] for k in dbs1}
    return _unpack_grads(dws, dbs)


def _pad_rays(x, tile):
    b = x.shape[0]
    pad = (-b) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, b


def _prep(origins, dirs, t_co, near, far, tile):
    nf2 = jnp.stack([near, far], axis=1).astype(jnp.float32)
    o_p, b = _pad_rays(origins.astype(jnp.float32), tile)
    d_p, _ = _pad_rays(dirs.astype(jnp.float32), tile)
    t_p, _ = _pad_rays(t_co.astype(jnp.float32), tile)
    nf_p, _ = _pad_rays(nf2, tile)
    return o_p, d_p, t_p, nf_p, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _render_fused(params, origins, dirs, t_co, near, far, n_fine,
                  white_bkgd, compute_dtype):
    tile = _ray_tile(t_co.shape[1], n_fine)
    o_p, d_p, t_p, nf_p, b = _prep(origins, dirs, t_co, near, far, tile)
    packed = pack_params(params, compute_dtype)
    c_co, c_fi = _fused_render_forward(
        packed, o_p, d_p, t_p, nf_p, n_fine, white_bkgd, compute_dtype, tile)
    return c_co[:b], c_fi[:b]


def _render_fused_fwd(params, origins, dirs, t_co, near, far, n_fine,
                      white_bkgd, compute_dtype):
    out = _render_fused(params, origins, dirs, t_co, near, far, n_fine,
                        white_bkgd, compute_dtype)
    return out, (params, origins, dirs, t_co, near, far)


def _render_fused_bwd(n_fine, white_bkgd, compute_dtype, residuals,
                      cotangents):
    params, origins, dirs, t_co, near, far = residuals
    g_cco, g_cfi = cotangents
    tile = _ray_tile(t_co.shape[1], n_fine)
    o_p, d_p, t_p, nf_p, _ = _prep(origins, dirs, t_co, near, far, tile)
    g_cco_p, _ = _pad_rays(g_cco.astype(jnp.float32), tile)
    g_cfi_p, _ = _pad_rays(g_cfi.astype(jnp.float32), tile)
    packed = pack_params(params, compute_dtype)
    grads = _fused_render_backward(
        packed, o_p, d_p, t_p, nf_p, g_cco_p, g_cfi_p, n_fine, white_bkgd,
        compute_dtype, tile)
    # ray geometry is training data — no cotangents flow to it
    return (grads, jnp.zeros_like(origins), jnp.zeros_like(dirs),
            jnp.zeros_like(t_co), jnp.zeros_like(near), jnp.zeros_like(far))


_render_fused.defvjp(_render_fused_fwd, _render_fused_bwd)


def render_fused(params, origins: jnp.ndarray, dirs: jnp.ndarray,
                 t_co: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray,
                 n_fine: int, white_bkgd: bool = False,
                 compute_dtype=jnp.bfloat16,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused coarse+fine hierarchical render of a ray batch.

    origins/dirs (B, 3), t_co (B, N_c) per-ray sorted coarse sample
    distances, near/far (B,) -> (C_coarse (B, 3), C_fine (B, 3)).

    Semantically identical to ``render.render_rays`` with the ``twolist``
    merge (reference quirks Q5/Q8/Q14 and the Q4 fix preserved); gradients
    flow to ``params`` only.
    """
    return _render_fused(params, origins, dirs, t_co, near, far,
                         int(n_fine), bool(white_bkgd), compute_dtype)
