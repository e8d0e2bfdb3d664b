"""Fused positional-encode -> skip-MLP -> heads Pallas TPU kernel.

This is the hot loop of the whole framework: per train step the MLP runs over
``batch * (N_c + N_f)`` sample rows (reference: 76,800 evals/step, SURVEY.md
§2.11). Left to XLA, each of the ~13 linear layers round-trips its
(rows, 256) activations through HBM; at production batch sizes that is
gigabytes per step against a few dozen bytes of kernel I/O per row. This
kernel keeps the whole network — all 594 K parameters fit comfortably in
VMEM — and every intermediate activation on-chip: HBM traffic is 6 floats in
(point, dir) and 4 out (rgb, sigma) per row, with one MXU matmul chain in
between.

The backward pass is a second Pallas kernel (flash-style): it re-computes the
tile's activations in VMEM and accumulates all weight gradients across grid
steps (TPU grids execute sequentially per core), emitting d(points)/d(dirs)
so gradients keep flowing into the hierarchical resampler exactly like the
pure-jnp path (reference behavior Q8).

Internal encoding layout is block-major ``[sin(f·x..), sin(f·y..),
sin(f·z..) | cos(...)]`` — cheaper to build on the VPU than the reference's
interleaved channel-major layout — and the first-layer/skip weight rows are
permuted to match, so results are bit-compatible with
``tinynerf.core.render.field_jnp`` (reference layout, nerf.py:159).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynerf.core.encoding import (DIR_ENC_DIM, L_DIR, L_POINT,
                                    POINT_ENC_DIM, freq_bank)

WIDTH = 256
DEPTH = 8
SKIP = 4

# Set True (before first call) to run kernels in the Pallas interpreter —
# used by the CPU test suite; on TPU leave False for compiled Mosaic.
INTERPRET = False

# Mosaic's default 16 MB scoped-VMEM cap rejects the larger (faster) tiles;
# v5e admits far more. 110 MB measured working on v5e-1.
_VMEM_LIMIT = 110 * 1024 * 1024

# ----------------------------------------------------------------------------
# host-side constants: frequency selector matrices and layout permutations
# ----------------------------------------------------------------------------


def _freq_selector(L: int) -> np.ndarray:
    """(3, 3L) FREQ-MAJOR selector: F[c, l*3 + c] = freq_l. Used only in the
    backward pass to reduce d(scaled) -> d(coords) as one small matmul; the
    forward scaling is elementwise (see _scaled_coords)."""
    freqs = freq_bank(L)
    sel = np.zeros((3, 3 * L), np.float32)
    for l in range(L):
        for c in range(3):
            sel[c, l * 3 + c] = freqs[l]
    return sel


def _layout_perm(L: int) -> np.ndarray:
    """kernel row k -> reference row. Kernel: [sin block (3L) | cos block
    (3L)] in FREQ-MAJOR order (k = l*3 + c, the layout pltpu.repeat
    produces); reference: channel blocks of interleaved
    [sin f0, cos f0, sin f1, ...] (nerf.py:159)."""
    perm = np.zeros(6 * L, np.int64)
    for k in range(3 * L):
        l, c = divmod(k, 3)
        perm[k] = c * 2 * L + 2 * l          # sin rows
        perm[3 * L + k] = c * 2 * L + 2 * l + 1  # cos rows
    return perm


_POINT_SEL = _freq_selector(L_POINT)   # (3, 30)
_DIR_SEL = _freq_selector(L_DIR)       # (3, 12)
_POINT_PERM = _layout_perm(L_POINT)    # (60,)
_DIR_PERM = _layout_perm(L_DIR)        # (24,)
_POINT_INV = np.argsort(_POINT_PERM)
_DIR_INV = np.argsort(_DIR_PERM)

# flat ordering of the packed weight operands fed to the kernels
_W_NAMES = (
    "w0", "w1", "w2", "w3", "w4h", "w4e", "w5", "w6", "w7",
    "wsig", "wpi", "wde", "wdp", "wcol",
)
_B_NAMES = ("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7",
            "bsig", "bpi", "bd", "bcol")


def pack_params(params, compute_dtype=jnp.float32):
    """Reference-layout param pytree -> kernel operand dict (traced, cheap).

    - trunk_0 / the skip-extra rows of trunk_4 are row-permuted into the
      kernel's block-major encoding layout;
    - trunk_4 is split into its hidden (256) and encoding (60) halves, and
      dir_info into its dir (24) and point_info (256) halves, so the kernel
      never materializes concatenations;
    - weights are cast to ``compute_dtype`` (bf16 for MXU fast path);
      biases stay f32 and are added post-accumulation.
    """
    cast = lambda w: w.astype(compute_dtype)
    p = params
    out = {
        "w0": cast(p["trunk_0"]["w"][_POINT_PERM]),
        "w4h": cast(p["trunk_4"]["w"][:WIDTH]),
        "w4e": cast(p["trunk_4"]["w"][WIDTH:][_POINT_PERM]),
        "wsig": cast(p["sigma"]["w"]),
        "wpi": cast(p["point_info"]["w"]),
        "wde": cast(p["dir_info"]["w"][:DIR_ENC_DIM][_DIR_PERM]),
        "wdp": cast(p["dir_info"]["w"][DIR_ENC_DIM:]),
        "wcol": cast(p["color"]["w"]),
        "b0": p["trunk_0"]["b"], "b4": p["trunk_4"]["b"],
        "bsig": p["sigma"]["b"], "bpi": p["point_info"]["b"],
        "bd": p["dir_info"]["b"], "bcol": p["color"]["b"],
    }
    for i in (1, 2, 3, 5, 6, 7):
        out[f"w{i}"] = cast(p[f"trunk_{i}"]["w"])
        out[f"b{i}"] = p[f"trunk_{i}"]["b"]
    return out


def _prec(dtype):
    """MXU precision: for f32 operands request the full-precision (multi-pass)
    f32 matmul — Mosaic's default multiplies at bf16 precision even for f32
    inputs. For bf16 operands the default single-pass path is exact."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _scaled_coords(x, sel):
    """(T, 3) coords -> (T, 3L) frequency-scaled values, freq-major layout
    (column l*3+c holds freq_l * x_c).

    Computed ELEMENTWISE (pltpu.repeat + multiply), never through the MXU:
    a matmul rounds 1 ulp differently from a plain multiply, and at
    arguments up to 2^L * pi * |x| (~6e3) one ulp in the argument moves
    sin/cos by ~5e-4 — which backprop through 8 layers amplifies into
    percent-level gradient error. The elementwise form is bit-identical to
    ``field_jnp``'s ``x[..., None] * freqs`` (modulo the layout permutation
    folded into the weights), and costs zero MXU passes.
    """
    L3 = sel.shape[1]
    freq_row = jnp.sum(sel, axis=0, keepdims=True)      # (1, 3L), exact
    x_rep = pltpu.repeat(x, L3 // 3, axis=1)            # [xyz xyz ...]
    return x_rep * freq_row


def _encode(x, sel, dtype):
    """(T, 3) coords -> (T, 6L) block-major encoding [sin | cos]."""
    scaled = _scaled_coords(x, sel)
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)],
                           axis=-1).astype(dtype)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_prec(a.dtype))


def _forward_tile(w, enc_pt, enc_dir, dtype, keep_acts=False):
    """Shared fwd math over one tile. Returns (color, sigma_pre) or, with
    ``keep_acts``, additionally the post-relu activations AND their relu
    masks pre-cast to the compute dtype — the backward pass multiplies by
    the mask instead of re-deriving it with f32 casts + compares (the cast
    chain costs ~4 VPU passes per (T, 256) layer; masks make it one bf16
    multiply)."""
    acts = []
    masks = []

    def relu(pre):  # pre: f32 accumulator output
        a = jax.nn.relu(pre).astype(dtype)
        if keep_acts:
            acts.append(a)
            masks.append((pre > 0.0).astype(dtype))
        return a

    h = relu(_mm(enc_pt, w["w0"]) + w["b0"])
    for i in (1, 2, 3):
        h = relu(_mm(h, w[f"w{i}"]) + w[f"b{i}"])
    h = relu(_mm(h, w["w4h"]) + _mm(enc_pt, w["w4e"]) + w["b4"])
    for i in (5, 6, 7):
        h = relu(_mm(h, w[f"w{i}"]) + w[f"b{i}"])
    sigma_pre = _mm(h, w["wsig"]) + w["bsig"]          # (T, 1) f32
    point_info = (_mm(h, w["wpi"]) + w["bpi"]).astype(dtype)
    hd_pre = _mm(enc_dir, w["wde"]) + _mm(point_info, w["wdp"]) + w["bd"]
    hd = jax.nn.relu(hd_pre).astype(dtype)
    color = jax.nn.sigmoid(_mm(hd, w["wcol"]) + w["bcol"])  # (T, 3) f32
    if keep_acts:
        hd_mask = (hd_pre > 0.0).astype(dtype)
        return color, sigma_pre, point_info, hd, hd_mask, acts, masks
    return color, sigma_pre


def _fwd_kernel(*refs, dtype):
    pts_ref, dirs_ref, ptsel_ref, dirsel_ref = refs[:4]
    w = {name: refs[4 + i][:] for i, name in enumerate(_W_NAMES)}
    b = {name: refs[4 + len(_W_NAMES) + i][:]
         for i, name in enumerate(_B_NAMES)}
    out_ref = refs[-1]
    w.update(b)

    enc_pt = _encode(pts_ref[:], ptsel_ref[:], dtype)
    enc_dir = _encode(dirs_ref[:], dirsel_ref[:], dtype)
    color, sigma_pre = _forward_tile(w, enc_pt, enc_dir, dtype)
    out_ref[:] = jnp.concatenate(
        [color, jnp.abs(sigma_pre)], axis=-1).astype(jnp.float32)


def _expand_rays(o, d, t):
    """(RT, 3) origins/dirs + (RT, N) ts -> per-sample (RT*N, 3) pts/dirs.

    The ray->point expansion lives INSIDE the kernel: in XLA a (R, 3) array
    tiles as T(8,128) with 3 of 128 lanes used, so materializing per-sample
    points/dirs in HBM wastes ~42x the bandwidth (profiled at ~3.5 ms/step
    of pure layout overhead). Here the expansion is a VMEM-local broadcast;
    HBM only ever sees (B, 3) per-ray vectors and the dense (B, N) t table.
    The leading-dims reshape (RT, N, 3) -> (RT*N, 3) keeps the lane dim
    untouched (the Mosaic-safe kind)."""
    rt, n = t.shape
    pts = (o[:, None, :] + t[..., None] * d[:, None, :]).reshape(rt * n, 3)
    dirb = jnp.broadcast_to(d[:, None, :], (rt, n, 3)).reshape(rt * n, 3)
    return pts, dirb


def _ray_fwd_kernel(*refs, dtype):
    o_ref, d_ref, ts_ref, ptsel_ref, dirsel_ref = refs[:5]
    w = {name: refs[5 + i][:] for i, name in enumerate(_W_NAMES)}
    b = {name: refs[5 + len(_W_NAMES) + i][:]
         for i, name in enumerate(_B_NAMES)}
    sigma_ref = refs[-4]
    col_refs = refs[-3:]
    w.update(b)

    t = ts_ref[:]
    pts, dirb = _expand_rays(o_ref[:], d_ref[:], t)
    enc_pt = _encode(pts, ptsel_ref[:], dtype)
    enc_dir = _encode(dirb, dirsel_ref[:], dtype)
    color, sigma_pre = _forward_tile(w, enc_pt, enc_dir, dtype)
    # EVERY scalar output leaves the kernel in the dense (rays, samples)
    # layout the renderer consumes: sigma and the three color channels each
    # as (B, N). Emitting color as (rows, 3) instead makes XLA store a
    # 3-of-128-lane padded array and relayout it for the tail — measured
    # ~1.2 ms/step of copies plus the hidden lane-padding traffic. The
    # (rows, 1) -> (rt, N) reshape (sublanes->lanes) is the
    # Mosaic-supported direction.
    sigma_ref[:] = jnp.abs(sigma_pre).astype(jnp.float32).reshape(t.shape)
    for c in range(3):
        col_refs[c][:] = color[:, c:c + 1].astype(jnp.float32).reshape(
            t.shape)


def _flops_per_row() -> int:
    per_row = (POINT_ENC_DIM * WIDTH + 6 * WIDTH * WIDTH
               + (WIDTH + POINT_ENC_DIM) * WIDTH + WIDTH
               + WIDTH * WIDTH + (WIDTH + DIR_ENC_DIM) * (WIDTH // 2)
               + (WIDTH // 2) * 3)
    return 2 * per_row


@functools.partial(jax.jit, static_argnames=("tile", "compute_dtype"))
def _fused_forward(packed, points, dirs, tile: int = 512,
                   compute_dtype=jnp.bfloat16):
    """points/dirs (R, 3) -> out (R, 4) = [rgb, sigma]. R % tile == 0."""
    R = points.shape[0]
    grid = (R // tile,)
    row_spec = pl.BlockSpec((tile, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    w_ops = [packed[n] for n in _W_NAMES]
    b_ops = [packed[n] for n in _B_NAMES]
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dtype=compute_dtype),
        grid=grid,
        in_specs=[row_spec, row_spec] + [full(a) for a in sels + w_ops + b_ops],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=_flops_per_row() * R,
            bytes_accessed=R * (6 + 4) * 4 + 600_000 * 2,
            transcendentals=R * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(points, dirs, *sels, *w_ops, *b_ops)
    return out


# ----------------------------------------------------------------------------
# backward kernel: recompute activations per tile, accumulate weight grads
# ----------------------------------------------------------------------------


def _bwd_kernel(*refs, dtype):
    pts_ref, dirs_ref, g_ref, ptsel_ref, dirsel_ref = refs[:5]
    ptsel, dirsel = ptsel_ref[:], dirsel_ref[:]
    w = {name: refs[5 + i][:] for i, name in enumerate(_W_NAMES)}
    b = {name: refs[5 + len(_W_NAMES) + i][:]
         for i, name in enumerate(_B_NAMES)}
    w.update(b)
    n_in = 5 + len(_W_NAMES) + len(_B_NAMES)
    # outputs: d_pts, d_dirs, dW..., db...
    dpts_ref, ddirs_ref = refs[n_in], refs[n_in + 1]
    dw_refs = {name: refs[n_in + 2 + i] for i, name in enumerate(_W_NAMES)}
    db_refs = {name: refs[n_in + 2 + len(_W_NAMES) + i]
               for i, name in enumerate(_B_NAMES)}

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for r in list(dw_refs.values()) + list(db_refs.values()):
            r[:] = jnp.zeros_like(r)

    d_pts, d_dirs = _bwd_core(pts_ref[:], dirs_ref[:], g_ref[:], ptsel,
                              dirsel, w, dw_refs, db_refs, dtype)
    dpts_ref[:] = d_pts
    ddirs_ref[:] = d_dirs


def _bwd_core(pts, dirs, g, ptsel, dirsel, w, dw_refs, db_refs, dtype):
    """Shared backward math over one tile: recompute fwd, accumulate weight
    grads into ``dw_refs/db_refs``, return (d_pts, d_dirs) each (T, 3) f32."""
    g_rgb = g[:, :3]
    g_sigma = g[:, 3:4]

    # ---- recompute forward with activations + relu masks kept in VMEM ----
    scaled_pt = _scaled_coords(pts, ptsel)
    scaled_dir = _scaled_coords(dirs, dirsel)
    sin_pt, cos_pt = jnp.sin(scaled_pt), jnp.cos(scaled_pt)
    sin_dir, cos_dir = jnp.sin(scaled_dir), jnp.cos(scaled_dir)
    enc_pt = jnp.concatenate([sin_pt, cos_pt], axis=-1).astype(dtype)
    enc_dir = jnp.concatenate([sin_dir, cos_dir], axis=-1).astype(dtype)
    color, sigma_pre, point_info, hd, hd_mask, acts, masks = _forward_tile(
        w, enc_pt, enc_dir, dtype, keep_acts=True)
    # acts/masks: per trunk layer 0..7

    cast = lambda x: x.astype(dtype)
    prec = _prec(dtype)
    dT = lambda a, gg: jax.lax.dot_general(          # a^T @ g, f32 accum
        a, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    # dgrad chain: Mosaic requires a 32-bit matmul accumulator, so mmT emits
    # f32; the relu mask multiply + single cast is fused right after (2 VPU
    # passes per layer instead of the old cast/compare/mult/cast chain)
    mmT = lambda gg, ww: jax.lax.dot_general(        # g @ w^T, f32 out
        gg, ww, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    mmT32 = mmT
    fsum = lambda x: jnp.sum(x, axis=0, dtype=jnp.float32)

    # ---- heads ----
    g_col_pre = cast(g_rgb * color * (1.0 - color))             # sigmoid'
    dw_refs["wcol"][:] += dT(hd, g_col_pre)
    db_refs["bcol"][:] += fsum(g_col_pre)

    g_hd = cast(mmT(g_col_pre, w["wcol"]) * hd_mask)             # relu'
    dw_refs["wde"][:] += dT(enc_dir, g_hd)
    dw_refs["wdp"][:] += dT(point_info, g_hd)
    db_refs["bd"][:] += fsum(g_hd)
    g_enc_dir = mmT32(g_hd, w["wde"])                           # (T, 24) f32
    g_pi = cast(mmT(g_hd, w["wdp"]))

    g_sig_pre = cast(g_sigma * jnp.sign(sigma_pre))             # d|x|
    h7 = acts[7]
    dw_refs["wsig"][:] += dT(h7, g_sig_pre)
    db_refs["bsig"][:] += fsum(g_sig_pre)
    dw_refs["wpi"][:] += dT(h7, g_pi)
    db_refs["bpi"][:] += fsum(g_pi)

    g_h = mmT(g_sig_pre, w["wsig"]) + mmT(g_pi, w["wpi"])  # f32

    return _trunk_bwd(g_h, g_enc_dir, acts, masks, enc_pt, w, dw_refs,
                      db_refs, dtype, sin_pt, cos_pt, sin_dir, cos_dir,
                      ptsel, dirsel)


def _trunk_bwd(g_h, g_enc_dir, acts, masks, enc_pt, w, dw_refs, db_refs,
               dtype, sin_pt, cos_pt, sin_dir, cos_dir, ptsel, dirsel):
    """Backward through trunk layers 7..0 + the positional encoding, given
    the f32 cotangent entering layer 7 and the dir-encoding cotangent.
    Shared by the rows-major head (:func:`_bwd_core`) and the per-channel
    2-D head (:func:`_ray_bwd_kernel`). Returns (d_pts, d_dirs)."""
    cast = lambda x: x.astype(dtype)
    prec = _prec(dtype)
    dT = lambda a, gg: jax.lax.dot_general(
        a, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    mmT = lambda gg, ww: jax.lax.dot_general(
        gg, ww, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    mmT32 = mmT
    fsum = lambda x: jnp.sum(x, axis=0, dtype=jnp.float32)

    # ---- trunk, layers 7..5 ----
    for i in (7, 6, 5):
        g_pre = cast(g_h * masks[i])
        dw_refs[f"w{i}"][:] += dT(acts[i - 1], g_pre)
        db_refs[f"b{i}"][:] += fsum(g_pre)
        g_h = mmT(g_pre, w[f"w{i}"])

    # ---- skip layer 4 ----
    g_pre4 = cast(g_h * masks[4])
    dw_refs["w4h"][:] += dT(acts[3], g_pre4)
    dw_refs["w4e"][:] += dT(enc_pt, g_pre4)
    db_refs["b4"][:] += fsum(g_pre4)
    g_h = mmT(g_pre4, w["w4h"])
    g_enc_pt = mmT32(g_pre4, w["w4e"])                          # (T, 60) f32

    # ---- layers 3..1 ----
    for i in (3, 2, 1):
        g_pre = cast(g_h * masks[i])
        dw_refs[f"w{i}"][:] += dT(acts[i - 1], g_pre)
        db_refs[f"b{i}"][:] += fsum(g_pre)
        g_h = mmT(g_pre, w[f"w{i}"])

    # ---- layer 0 ----
    g_pre0 = cast(g_h * masks[0])
    dw_refs["w0"][:] += dT(enc_pt, g_pre0)
    db_refs["b0"][:] += fsum(g_pre0)
    g_enc_pt = g_enc_pt + mmT32(g_pre0, w["w0"])

    # ---- through the encoding to the coordinates ----
    L3p, L3d = 3 * L_POINT, 3 * L_DIR
    g_scaled_pt = (g_enc_pt[:, :L3p] * cos_pt
                   - g_enc_pt[:, L3p:] * sin_pt)
    g_scaled_dir = (g_enc_dir[:, :L3d] * cos_dir
                    - g_enc_dir[:, L3d:] * sin_dir)
    d_pts = jax.lax.dot_general(
        g_scaled_pt, ptsel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    d_dirs = jax.lax.dot_general(
        g_scaled_dir, dirsel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    # (d_pts/d_dirs stay HIGHEST: two tiny matmuls, and the resampler
    # gradient path deserves full precision)
    return d_pts, d_dirs


def _ray_bwd_kernel(*refs, dtype):
    """Per-channel-cotangent backward: g arrives as FOUR dense (RT, N)
    arrays (sigma, r, g, b) — the same lane-dense layout the forward emits
    — instead of a lane-padded (rows, 4). The head cotangents enter the
    rows-major chain through outer-product bridges with the transposed
    head weights (lanes->sublanes reshapes are unsupported by Mosaic), and
    the head weight grads accumulate transposed (``wsigT``/``wcolT``/
    ``bsigT``/``bcolT`` outputs, transposed back in the wrapper)."""
    (o_ref, d_ref, ts_ref, gs_ref, g0_ref, g1_ref, g2_ref,
     ptsel_ref, dirsel_ref, wsigT_ref, wcolT_ref) = refs[:11]
    ptsel, dirsel = ptsel_ref[:], dirsel_ref[:]
    w = {name: refs[11 + i][:] for i, name in enumerate(_W_NAMES)}
    b = {name: refs[11 + len(_W_NAMES) + i][:]
         for i, name in enumerate(_B_NAMES)}
    w.update(b)
    n_in = 11 + len(_W_NAMES) + len(_B_NAMES)
    # outputs: d_origins, d_dirs (per ray), d_ts, dW..., db... where the
    # wsig/wcol/bsig/bcol entries are the transposed variants
    do_ref, dd_ref, dts_ref = refs[n_in], refs[n_in + 1], refs[n_in + 2]
    wnames = [n for n in _W_NAMES if n not in ("wsig", "wcol")]
    dw_refs = {name: refs[n_in + 3 + i] for i, name in enumerate(wnames)}
    dwsigT_ref = refs[n_in + 3 + len(wnames)]
    dwcolT_ref = refs[n_in + 4 + len(wnames)]
    bnames = [n for n in _B_NAMES if n not in ("bsig", "bcol")]
    db_refs = {name: refs[n_in + 5 + len(wnames) + i]
               for i, name in enumerate(bnames)}
    dbsigT_ref = refs[n_in + 5 + len(wnames) + len(bnames)]
    dbcolT_ref = refs[n_in + 6 + len(wnames) + len(bnames)]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (list(dw_refs.values()) + list(db_refs.values())
                  + [dwsigT_ref, dwcolT_ref, dbsigT_ref, dbcolT_ref]):
            r[:] = jnp.zeros_like(r)

    o, d, t = o_ref[:], d_ref[:], ts_ref[:]
    rt, n = t.shape
    rows = rt * n
    pts, dirb = _expand_rays(o, d, t)

    # ---- recompute forward with activations + relu masks ----
    scaled_pt = _scaled_coords(pts, ptsel)
    scaled_dir = _scaled_coords(dirb, dirsel)
    sin_pt, cos_pt = jnp.sin(scaled_pt), jnp.cos(scaled_pt)
    sin_dir, cos_dir = jnp.sin(scaled_dir), jnp.cos(scaled_dir)
    enc_pt = jnp.concatenate([sin_pt, cos_pt], axis=-1).astype(dtype)
    enc_dir = jnp.concatenate([sin_dir, cos_dir], axis=-1).astype(dtype)
    color, sigma_pre, point_info, hd, hd_mask, acts, masks = _forward_tile(
        w, enc_pt, enc_dir, dtype, keep_acts=True)

    cast = lambda x: x.astype(dtype)
    prec = _prec(dtype)
    dT = lambda a, gg: jax.lax.dot_general(
        a, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    mmT = lambda gg, ww: jax.lax.dot_general(
        gg, ww, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    fsum = lambda x: jnp.sum(x, axis=0, dtype=jnp.float32)

    # ---- sigma head via the (RT, N) bridge ----
    sig_pre2d = sigma_pre.reshape(rt, n)
    gs = gs_ref[:] * jnp.sign(sig_pre2d)                    # f32 (RT, N)
    h7 = acts[7]
    h7_3d = h7.reshape(rt, n, WIDTH)
    dwsigT_ref[:] += jnp.sum(
        h7_3d.astype(jnp.float32) * gs[:, :, None], axis=(0, 1),
        dtype=jnp.float32).reshape(1, WIDTH)
    dbsigT_ref[:] += jnp.sum(jnp.sum(gs, axis=1, keepdims=True), axis=0,
                             keepdims=True)
    wsigT = wsigT_ref[:].astype(jnp.float32)                # (1, WIDTH)

    # ---- color head, one (RT, N) bridge per channel ----
    half = WIDTH // 2
    hd_3d = hd.reshape(rt, n, half)
    wcolT = wcolT_ref[:].astype(jnp.float32)                # (3, half)
    g_hd_f32 = jnp.zeros((rows, half), jnp.float32)
    for c, gc_ref in enumerate((g0_ref, g1_ref, g2_ref)):
        col_c = color[:, c:c + 1].astype(jnp.float32).reshape(rt, n)
        gp = gc_ref[:] * col_c * (1.0 - col_c)              # sigmoid'
        dwcolT_ref[c:c + 1, :] += jnp.sum(
            hd_3d.astype(jnp.float32) * gp[:, :, None], axis=(0, 1),
            dtype=jnp.float32).reshape(1, half)
        dbcolT_ref[:, c:c + 1] += jnp.sum(
            jnp.sum(gp, axis=1, keepdims=True), axis=0, keepdims=True)
        g_hd_f32 = g_hd_f32 + (gp[:, :, None]
                               * wcolT[c][None, None, :]).reshape(rows, half)

    g_hd = cast(g_hd_f32) * hd_mask                         # relu'
    dw_refs["wde"][:] += dT(enc_dir, g_hd)
    dw_refs["wdp"][:] += dT(point_info, g_hd)
    db_refs["bd"][:] += fsum(g_hd)
    g_enc_dir = mmT(g_hd, w["wde"])                         # (rows, 24) f32
    g_pi = cast(mmT(g_hd, w["wdp"]))
    dw_refs["wpi"][:] += dT(h7, g_pi)
    db_refs["bpi"][:] += fsum(g_pi)

    g_h = ((gs[:, :, None] * wsigT[None, :, :]).reshape(rows, WIDTH)
           + mmT(g_pi, w["wpi"]))                           # f32, enters L7

    d_pts, d_dirs = _trunk_bwd(g_h, g_enc_dir, acts, masks, enc_pt, w,
                               dw_refs, db_refs, dtype, sin_pt, cos_pt,
                               sin_dir, cos_dir, ptsel, dirsel)
    # chain rule through pts = o + t*d, dirs = broadcast(d): reduce the
    # per-sample coordinate grads to per-ray / per-sample-t grads in VMEM —
    # these (RT, N) / (RT, 3) outputs are what hit HBM, never (R, 3)
    d_pts3 = d_pts.reshape(rt, n, 3)
    d_dir3 = d_dirs.reshape(rt, n, 3)
    dts_ref[:] = jnp.sum(d_pts3 * d[:, None, :], axis=2)       # (RT, N)
    do_ref[:] = jnp.sum(d_pts3, axis=1)                        # (RT, 3)
    dd_ref[:] = jnp.sum(d_pts3 * t[..., None] + d_dir3, axis=1)


@functools.partial(jax.jit, static_argnames=("tile", "compute_dtype"))
def _fused_backward(packed, points, dirs, g, tile: int = 256,
                    compute_dtype=jnp.bfloat16):
    R = points.shape[0]
    grid = (R // tile,)
    row3 = pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    row4 = pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    w_ops = [packed[n] for n in _W_NAMES]
    b_ops = [packed[n] for n in _B_NAMES]
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]

    dw_shapes = [jax.ShapeDtypeStruct(packed[n].shape, jnp.float32)
                 for n in _W_NAMES]
    db_shapes = [jax.ShapeDtypeStruct(packed[n].shape, jnp.float32)
                 for n in _B_NAMES]
    out_shapes = ([jax.ShapeDtypeStruct((R, 3), jnp.float32)] * 2
                  + dw_shapes + db_shapes)
    out_specs = ([row3, row3]
                 + [full(s) for s in dw_shapes + db_shapes])

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dtype=compute_dtype),
        grid=grid,
        in_specs=[row3, row3, row4] + [full(a) for a in sels + w_ops + b_ops],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _flops_per_row() * R,
            bytes_accessed=R * 14 * 4 + 600_000 * 6,
            transcendentals=R * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(points, dirs, g, *sels, *w_ops, *b_ops)

    d_pts, d_dirs = outs[0], outs[1]
    dws = dict(zip(_W_NAMES, outs[2:2 + len(_W_NAMES)]))
    dbs = dict(zip(_B_NAMES, outs[2 + len(_W_NAMES):]))
    return d_pts, d_dirs, dws, dbs


def _unpack_grads(dws, dbs):
    """Kernel-layout weight grads -> reference-layout param pytree."""
    grads = {
        "trunk_0": {"w": dws["w0"][_POINT_INV], "b": dbs["b0"]},
        "trunk_4": {"w": jnp.concatenate(
            [dws["w4h"], dws["w4e"][_POINT_INV]], axis=0), "b": dbs["b4"]},
        "sigma": {"w": dws["wsig"], "b": dbs["bsig"]},
        "point_info": {"w": dws["wpi"], "b": dbs["bpi"]},
        "dir_info": {"w": jnp.concatenate(
            [dws["wde"][_DIR_INV], dws["wdp"]], axis=0), "b": dbs["bd"]},
        "color": {"w": dws["wcol"], "b": dbs["bcol"]},
    }
    for i in (1, 2, 3, 5, 6, 7):
        grads[f"trunk_{i}"] = {"w": dws[f"w{i}"], "b": dbs[f"b{i}"]}
    return grads


# ----------------------------------------------------------------------------
# public field fn: custom-VJP wrapper matching render.FieldFn
# ----------------------------------------------------------------------------

def _tile_fwd(dtype):
    return 256 if dtype == jnp.float32 else 1024


def _tile_bwd(dtype):
    # f32 + Precision.HIGHEST needs extra MXU scratch
    return 128 if dtype == jnp.float32 else 1024


def _pad_rows(x, tile):
    R = x.shape[0]
    pad = (-R) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x, R


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _field_flat(params, pts, dirs, compute_dtype):
    packed = pack_params(params, compute_dtype)
    tile = _tile_fwd(compute_dtype)
    pts_p, R = _pad_rows(pts, tile)
    dirs_p, _ = _pad_rows(dirs, tile)
    out = _fused_forward(packed, pts_p, dirs_p, tile=tile,
                         compute_dtype=compute_dtype)[:R]
    return out[:, :3], out[:, 3:4]


def _field_flat_fwd(params, pts, dirs, compute_dtype):
    out = _field_flat(params, pts, dirs, compute_dtype)
    return out, (params, pts, dirs)


def _field_flat_bwd(compute_dtype, residuals, cotangents):
    params, pts, dirs = residuals
    g_rgb, g_sigma = cotangents
    g = jnp.concatenate([g_rgb, g_sigma], axis=-1)
    packed = pack_params(params, compute_dtype)
    tile = _tile_bwd(compute_dtype)
    pts_p, R = _pad_rows(pts, tile)
    dirs_p, _ = _pad_rows(dirs, tile)
    g_p, _ = _pad_rows(g, tile)
    d_pts, d_dirs, dws, dbs = _fused_backward(
        packed, pts_p, dirs_p, g_p, tile=tile,
        compute_dtype=compute_dtype)
    return _unpack_grads(dws, dbs), d_pts[:R], d_dirs[:R]


_field_flat.defvjp(_field_flat_fwd, _field_flat_bwd)


def field_pallas(params, points: jnp.ndarray, dirs: jnp.ndarray,
                 compute_dtype=jnp.bfloat16,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`tinynerf.core.render.field_jnp` running
    the fused Pallas kernel. points/dirs (..., 3) -> (color, sigma)."""
    lead = points.shape[:-1]
    pts = points.reshape(-1, 3).astype(jnp.float32)
    drs = dirs.reshape(-1, 3).astype(jnp.float32)
    color, sigma = _field_flat(params, pts, drs, compute_dtype)
    return color.reshape(*lead, 3), sigma.reshape(*lead, 1)


def field_pallas_f32(params, points, dirs):
    """fp32-compute variant (slower, tighter parity with field_jnp)."""
    return field_pallas(params, points, dirs, compute_dtype=jnp.float32)


# ----------------------------------------------------------------------------
# ray-major entry: (origins, dirs, ts) in, per-ray grads out. The renderer's
# hot path — no (R, 3) per-sample coordinate arrays ever touch HBM.
# ----------------------------------------------------------------------------


def _ray_tile(n_samples: int) -> int:
    """Rays per grid step: targets ~1024 sample rows per tile (the measured
    bwd sweet spot) while keeping rows a multiple of 8 sublanes."""
    rt = max(1, 1024 // n_samples)
    return ((rt + 7) // 8) * 8


def _pad_rays(x, rt):
    b = x.shape[0]
    pad = (-b) % rt
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, b


@functools.partial(jax.jit, static_argnames=("ray_tile", "compute_dtype"))
def _fused_ray_forward(packed, origins, dirs, ts, ray_tile: int,
                       compute_dtype=jnp.bfloat16):
    """origins/dirs (B, 3), ts (B, N) -> (sigma, r, g, b) each dense (B, N).
    B % ray_tile == 0."""
    B, N = ts.shape
    grid = (B // ray_tile,)
    ray3 = pl.BlockSpec((ray_tile, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayn = pl.BlockSpec((ray_tile, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    w_ops = [packed[n] for n in _W_NAMES]
    b_ops = [packed[n] for n in _B_NAMES]
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]
    return pl.pallas_call(
        functools.partial(_ray_fwd_kernel, dtype=compute_dtype),
        grid=grid,
        in_specs=[ray3, ray3, rayn] + [full(a) for a in sels + w_ops + b_ops],
        out_specs=[rayn] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=_flops_per_row() * B * N,
            bytes_accessed=B * (N + 10) * 4 + 600_000 * 2,
            transcendentals=B * N * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(origins, dirs, ts, *sels, *w_ops, *b_ops)


@functools.partial(jax.jit, static_argnames=("ray_tile", "compute_dtype"))
def _fused_ray_backward(packed, origins, dirs, ts, g_sigma, g_r, g_g, g_b,
                        ray_tile: int, compute_dtype=jnp.bfloat16):
    """Per-channel (B, N) cotangents -> (d_origins, d_dirs, d_ts, dws, dbs).
    The head weight/bias grads come back transposed from the kernel
    (``wsigT``/``wcolT``/``bsigT``/``bcolT``) and are restored to the packed
    layout here."""
    B, N = ts.shape
    grid = (B // ray_tile,)
    ray3 = pl.BlockSpec((ray_tile, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayn = pl.BlockSpec((ray_tile, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    w_ops = [packed[n] for n in _W_NAMES]
    b_ops = [packed[n] for n in _B_NAMES]
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]
    wsigT = packed["wsig"].T                                # (1, WIDTH)
    wcolT = packed["wcol"].T                                # (3, WIDTH // 2)

    wnames = [n for n in _W_NAMES if n not in ("wsig", "wcol")]
    dw_shapes = ([jax.ShapeDtypeStruct(packed[n].shape, jnp.float32)
                  for n in wnames]
                 + [jax.ShapeDtypeStruct(wsigT.shape, jnp.float32),
                    jax.ShapeDtypeStruct(wcolT.shape, jnp.float32)])
    bnames = [n for n in _B_NAMES if n not in ("bsig", "bcol")]
    db_shapes = ([jax.ShapeDtypeStruct(packed[n].shape, jnp.float32)
                  for n in bnames]
                 + [jax.ShapeDtypeStruct((1, 1), jnp.float32),
                    jax.ShapeDtypeStruct((1, 3), jnp.float32)])
    out_shapes = ([jax.ShapeDtypeStruct((B, 3), jnp.float32)] * 2
                  + [jax.ShapeDtypeStruct((B, N), jnp.float32)]
                  + dw_shapes + db_shapes)
    out_specs = ([ray3, ray3, rayn]
                 + [full(s) for s in dw_shapes + db_shapes])

    outs = pl.pallas_call(
        functools.partial(_ray_bwd_kernel, dtype=compute_dtype),
        grid=grid,
        in_specs=[ray3, ray3, rayn, rayn, rayn, rayn, rayn]
        + [full(a) for a in sels + [wsigT, wcolT] + w_ops + b_ops],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _flops_per_row() * B * N,
            bytes_accessed=B * (2 * N + 16) * 4 + 600_000 * 6,
            transcendentals=B * N * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(origins, dirs, ts, g_sigma, g_r, g_g, g_b, *sels, wsigT, wcolT,
      *w_ops, *b_ops)

    d_o, d_d, d_ts = outs[0], outs[1], outs[2]
    k = 3
    dws = dict(zip(wnames, outs[k:k + len(wnames)]))
    dws["wsig"] = outs[k + len(wnames)].T                   # (WIDTH, 1)
    dws["wcol"] = outs[k + len(wnames) + 1].T               # (WIDTH//2, 3)
    k = k + len(wnames) + 2
    dbs = dict(zip(bnames, outs[k:k + len(bnames)]))
    dbs["bsig"] = outs[k + len(bnames)].reshape(
        packed["bsig"].shape)
    dbs["bcol"] = outs[k + len(bnames) + 1].reshape(
        packed["bcol"].shape)
    return d_o, d_d, d_ts, dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ray_field(params, origins, dirs, ts, compute_dtype):
    rt = _ray_tile(ts.shape[1])
    o_p, B = _pad_rays(origins, rt)
    d_p, _ = _pad_rays(dirs, rt)
    t_p, _ = _pad_rays(ts, rt)
    packed = pack_params(params, compute_dtype)
    sigma, r, g, b = _fused_ray_forward(packed, o_p, d_p, t_p, ray_tile=rt,
                                        compute_dtype=compute_dtype)
    return (r[:B], g[:B], b[:B]), sigma[:B]


def _ray_field_fwd(params, origins, dirs, ts, compute_dtype):
    out = _ray_field(params, origins, dirs, ts, compute_dtype)
    return out, (params, origins, dirs, ts)


def _ray_field_bwd(compute_dtype, residuals, cotangents):
    params, origins, dirs, ts = residuals
    (g_r, g_g, g_b), g_sigma = cotangents       # each (B, N)
    B, N = ts.shape
    rt = _ray_tile(N)
    o_p, _ = _pad_rays(origins, rt)
    d_p, _ = _pad_rays(dirs, rt)
    t_p, _ = _pad_rays(ts, rt)
    gs_p, _ = _pad_rays(g_sigma, rt)
    gr_p, _ = _pad_rays(g_r, rt)
    gg_p, _ = _pad_rays(g_g, rt)
    gb_p, _ = _pad_rays(g_b, rt)
    packed = pack_params(params, compute_dtype)
    d_o, d_d, d_ts, dws, dbs = _fused_ray_backward(
        packed, o_p, d_p, t_p, gs_p, gr_p, gg_p, gb_p, ray_tile=rt,
        compute_dtype=compute_dtype)
    return (_unpack_grads(dws, dbs), d_o[:B], d_d[:B], d_ts[:B])


_ray_field.defvjp(_ray_field_fwd, _ray_field_bwd)


def field_pallas_rays(params, origins: jnp.ndarray, dirs: jnp.ndarray,
                      ts: jnp.ndarray, compute_dtype=jnp.bfloat16,
                      ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Ray-major fused field: evaluates the network at ``origin + t * dir``
    for every (ray, sample) pair. origins/dirs (B, 3), ts (B, N) ->
    ((r, g, b), sigma) where every output is a dense (B, N) array — the
    per-CHANNEL layout the renderer tail consumes.

    The per-sample point/direction expansion and its backward reduction
    happen inside the kernel, so the (B*N, 3) coordinate tensors — which XLA
    tiles with 3 of 128 lanes used — never exist in HBM; likewise color
    crosses HBM as three lane-dense planes instead of a 3-lane-padded
    (B*N, 3) (measured ~1.2 ms/step of XLA relayout copies plus the padding
    traffic). Gradients flow to origins, dirs AND ts (the resampler path,
    Q8)."""
    return _ray_field(params, origins.astype(jnp.float32),
                      dirs.astype(jnp.float32), ts.astype(jnp.float32),
                      compute_dtype)
