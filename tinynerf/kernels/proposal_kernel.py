"""Fused Pallas kernel for the PROPOSAL coarse field (core/proposal.py).

STATUS: working, bit-compatible with ``proposal.field_proposal`` (tested in
interpreter mode + compiled on TPU), but measured SLOWER than XLA's own
lowering of the narrow net and therefore OPT-IN (``PROP_PALLAS = True``;
default prop path is pure jnp). Measured at batch 4096, 64 coarse samples:
kernel fwd 2.24 ms + bwd 4.47 ms = 6.7 ms vs ~3.9 ms for the XLA lowering.
Why the big-net recipe does not transfer: the per-row cost of the NARROW
net is dominated by the fixed PE transcendentals (~204 sin/cos per row vs
only 57k MACs), which the kernel serializes across its sequential grid
steps while XLA overlaps independent fusions; raising the tile to amortize
grid steps (8192 rows) sent Mosaic compile time past 15 minutes — the same
failure mode as the round-2 whole-renderer fusion (render_kernel.py).

This kernel applies the exact recipe of ``mlp_kernel.py`` to the proposal
architecture: ray->point expansion, positional encoding, the trunk chain
and both heads in one VMEM-resident pass, per-channel (B, N) plane I/O, and
a flash-style recompute backward that accumulates weight grads across the
sequential grid.

Architecture (must match ``proposal.apply_proposal``):
  h   = relu-chain of ``depth`` x ``width`` linears over enc_pt (no skip)
  sigma = abs(h @ wsig + bsig)
  color = sigmoid(enc_dir @ wce + h @ wch + bc)   # dir-first concat split

Shares the encoding layout machinery (block-major [sin|cos], permutations
folded into first-layer/color-dir weight rows) with ``mlp_kernel`` so the
outputs are bit-compatible with the pure-jnp ``field_proposal``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynerf.core.encoding import DIR_ENC_DIM, L_DIR, L_POINT
from tinynerf.kernels import mlp_kernel as mk
from tinynerf.kernels.mlp_kernel import (_DIR_INV, _DIR_PERM, _DIR_SEL,
                                         _POINT_INV, _POINT_PERM, _POINT_SEL,
                                         _VMEM_LIMIT, _encode, _expand_rays,
                                         _mm, _pad_rays, _prec,
                                         _scaled_coords)


def _depth(params) -> int:
    return sum(1 for k in params if k.startswith("trunk_"))


def pack_prop(params, compute_dtype=jnp.bfloat16):
    """Reference-layout proposal pytree -> flat kernel operand lists.

    Returns (ws, bs): ws = [w0..w_{D-1}, wsig, wce, wch], bs = [b0..b_{D-1},
    bsig, bc]. w0's rows and the dir-encoding half of the color weight are
    permuted into the kernel's block-major encoding layout."""
    cast = lambda w: w.astype(compute_dtype)
    depth = _depth(params)
    ws = [cast(params["trunk_0"]["w"][_POINT_PERM])]
    bs = [params["trunk_0"]["b"]]
    for i in range(1, depth):
        ws.append(cast(params[f"trunk_{i}"]["w"]))
        bs.append(params[f"trunk_{i}"]["b"])
    ws.append(cast(params["sigma"]["w"]))
    ws.append(cast(params["color"]["w"][:DIR_ENC_DIM][_DIR_PERM]))
    ws.append(cast(params["color"]["w"][DIR_ENC_DIM:]))
    bs.append(params["sigma"]["b"])
    bs.append(params["color"]["b"])
    return ws, bs


def _prop_forward_tile(ws, bs, enc_pt, enc_dir, dtype, depth,
                      keep_acts=False):
    acts, masks = [], []

    def relu(pre):
        a = jax.nn.relu(pre).astype(dtype)
        if keep_acts:
            acts.append(a)
            masks.append((pre > 0.0).astype(dtype))
        return a

    h = relu(_mm(enc_pt, ws[0]) + bs[0])
    for i in range(1, depth):
        h = relu(_mm(h, ws[i]) + bs[i])
    sigma_pre = _mm(h, ws[depth]) + bs[depth]                    # (T, 1) f32
    color = jax.nn.sigmoid(
        _mm(enc_dir, ws[depth + 1]) + _mm(h, ws[depth + 2])
        + bs[depth + 1])                                         # (T, 3) f32
    if keep_acts:
        return color, sigma_pre, acts, masks
    return color, sigma_pre


def _prop_ray_fwd_kernel(*refs, dtype, depth):
    o_ref, d_ref, ts_ref, ptsel_ref, dirsel_ref = refs[:5]
    n_w = depth + 3
    ws = [refs[5 + i][:] for i in range(n_w)]
    bs = [refs[5 + n_w + i][:] for i in range(depth + 2)]
    sigma_ref = refs[-4]
    col_refs = refs[-3:]

    t = ts_ref[:]
    pts, dirb = _expand_rays(o_ref[:], d_ref[:], t)
    enc_pt = _encode(pts, ptsel_ref[:], dtype)
    enc_dir = _encode(dirb, dirsel_ref[:], dtype)
    color, sigma_pre = _prop_forward_tile(ws, bs, enc_pt, enc_dir, dtype,
                                          depth)
    sigma_ref[:] = jnp.abs(sigma_pre).astype(jnp.float32).reshape(t.shape)
    for c in range(3):
        col_refs[c][:] = color[:, c:c + 1].astype(jnp.float32).reshape(
            t.shape)


def _prop_ray_bwd_kernel(*refs, dtype, depth):
    (o_ref, d_ref, ts_ref, gs_ref, g0_ref, g1_ref, g2_ref,
     ptsel_ref, dirsel_ref, wsigT_ref, wceT_ref, wchT_ref) = refs[:12]
    ptsel, dirsel = ptsel_ref[:], dirsel_ref[:]
    n_w = depth + 3
    ws = [refs[12 + i][:] for i in range(n_w)]
    bs = [refs[12 + n_w + i][:] for i in range(depth + 2)]
    n_in = 12 + n_w + depth + 2
    do_ref, dd_ref, dts_ref = refs[n_in], refs[n_in + 1], refs[n_in + 2]
    dw_refs = [refs[n_in + 3 + i] for i in range(depth)]   # trunk weights
    dwsigT_ref = refs[n_in + 3 + depth]
    dwceT_ref = refs[n_in + 4 + depth]
    dwchT_ref = refs[n_in + 5 + depth]
    db_refs = [refs[n_in + 6 + depth + i] for i in range(depth)]
    dbsigT_ref = refs[n_in + 6 + 2 * depth]
    dbcT_ref = refs[n_in + 7 + 2 * depth]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dw_refs + db_refs
                  + [dwsigT_ref, dwceT_ref, dwchT_ref, dbsigT_ref, dbcT_ref]):
            r[:] = jnp.zeros_like(r)

    o, d, t = o_ref[:], d_ref[:], ts_ref[:]
    rt, n = t.shape
    rows = rt * n
    width = ws[1].shape[0] if depth > 1 else ws[0].shape[1]
    pts, dirb = _expand_rays(o, d, t)

    # ---- recompute forward with activations + relu masks ----
    scaled_pt = _scaled_coords(pts, ptsel)
    scaled_dir = _scaled_coords(dirb, dirsel)
    sin_pt, cos_pt = jnp.sin(scaled_pt), jnp.cos(scaled_pt)
    sin_dir, cos_dir = jnp.sin(scaled_dir), jnp.cos(scaled_dir)
    enc_pt = jnp.concatenate([sin_pt, cos_pt], axis=-1).astype(dtype)
    enc_dir = jnp.concatenate([sin_dir, cos_dir], axis=-1).astype(dtype)
    color, sigma_pre, acts, masks = _prop_forward_tile(
        ws, bs, enc_pt, enc_dir, dtype, depth, keep_acts=True)

    cast = lambda x: x.astype(dtype)
    prec = _prec(dtype)
    dT = lambda a, gg: jax.lax.dot_general(
        a, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec)
    mmT = lambda gg, wref: jax.lax.dot_general(
        gg, wref, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    fsum = lambda x: jnp.sum(x, axis=0, dtype=jnp.float32)

    # ---- sigma head via the (RT, N) bridge ----
    sig2d = sigma_pre.reshape(rt, n)
    gs = gs_ref[:] * jnp.sign(sig2d)                       # f32 (RT, N)
    h_last = acts[depth - 1]
    h3 = h_last.reshape(rt, n, width)
    dwsigT_ref[:] += jnp.sum(
        h3.astype(jnp.float32) * gs[:, :, None], axis=(0, 1),
        dtype=jnp.float32).reshape(1, width)
    dbsigT_ref[:] += jnp.sum(jnp.sum(gs, axis=1, keepdims=True), axis=0,
                             keepdims=True)
    wsigT = wsigT_ref[:].astype(jnp.float32)               # (1, width)
    g_h = (gs[:, :, None] * wsigT[None, :, :]).reshape(rows, width)

    # ---- color head, one (RT, N) bridge per channel ----
    enc_dir3 = enc_dir.reshape(rt, n, DIR_ENC_DIM)
    wceT = wceT_ref[:].astype(jnp.float32)                 # (3, 24)
    wchT = wchT_ref[:].astype(jnp.float32)                 # (3, width)
    g_enc_dir = jnp.zeros((rows, DIR_ENC_DIM), jnp.float32)
    for c, gc_ref in enumerate((g0_ref, g1_ref, g2_ref)):
        col_c = color[:, c:c + 1].reshape(rt, n)           # f32
        gp = gc_ref[:] * col_c * (1.0 - col_c)             # sigmoid'
        dwchT_ref[c:c + 1, :] += jnp.sum(
            h3.astype(jnp.float32) * gp[:, :, None], axis=(0, 1),
            dtype=jnp.float32).reshape(1, width)
        dwceT_ref[c:c + 1, :] += jnp.sum(
            enc_dir3.astype(jnp.float32) * gp[:, :, None], axis=(0, 1),
            dtype=jnp.float32).reshape(1, DIR_ENC_DIM)
        dbcT_ref[:, c:c + 1] += jnp.sum(
            jnp.sum(gp, axis=1, keepdims=True), axis=0, keepdims=True)
        g_h = g_h + (gp[:, :, None]
                     * wchT[c][None, None, :]).reshape(rows, width)
        g_enc_dir = g_enc_dir + (gp[:, :, None]
                                 * wceT[c][None, None, :]).reshape(
                                     rows, DIR_ENC_DIM)

    # ---- trunk, layers depth-1 .. 1 ----
    for i in range(depth - 1, 0, -1):
        g_pre = cast(g_h * masks[i])
        dw_refs[i][:] += dT(acts[i - 1], g_pre)
        db_refs[i][:] += fsum(g_pre)
        g_h = mmT(g_pre, ws[i])

    # ---- layer 0 + encoding backward ----
    g_pre0 = cast(g_h * masks[0])
    dw_refs[0][:] += dT(enc_pt, g_pre0)
    db_refs[0][:] += fsum(g_pre0)
    g_enc_pt = mmT(g_pre0, ws[0])                          # (rows, 60) f32

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

    d_pts3 = d_pts.reshape(rt, n, 3)
    d_dir3 = d_dirs.reshape(rt, n, 3)
    dts_ref[:] = jnp.sum(d_pts3 * d[:, None, :], axis=2)   # (RT, N)
    do_ref[:] = jnp.sum(d_pts3, axis=1)                    # (RT, 3)
    dd_ref[:] = jnp.sum(d_pts3 * t[..., None] + d_dir3, axis=1)


def _prop_flops_per_row(width: int, depth: int) -> int:
    from tinynerf.core.encoding import POINT_ENC_DIM
    per_row = (POINT_ENC_DIM * width + (depth - 1) * width * width
               + width + (width + DIR_ENC_DIM) * 3)
    return 2 * per_row


def _ray_tile(n_samples: int, target_rows: int = 2048) -> int:
    """Rays per grid step. 2048 rows compiles fast and runs; 8192 rows sent
    Mosaic compile time through the roof (>15 min, killed) — same failure
    mode as the round-2 whole-renderer fusion. See STATUS in the module
    docstring: this kernel is measured SLOWER than XLA on the narrow net
    and is therefore opt-in."""
    rt = max(1, target_rows // n_samples)
    return ((rt + 7) // 8) * 8


@functools.partial(jax.jit, static_argnames=("ray_tile", "compute_dtype",
                                             "depth"))
def _prop_ray_forward(ws, bs, origins, dirs, ts, ray_tile: int, depth: int,
                      compute_dtype=jnp.bfloat16):
    B, N = ts.shape
    grid = (B // ray_tile,)
    ray3 = pl.BlockSpec((ray_tile, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayn = pl.BlockSpec((ray_tile, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]
    width = ws[0].shape[1]
    return pl.pallas_call(
        functools.partial(_prop_ray_fwd_kernel, dtype=compute_dtype,
                          depth=depth),
        grid=grid,
        in_specs=[ray3, ray3, rayn] + [full(a) for a in sels + ws + bs],
        out_specs=[rayn] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=_prop_flops_per_row(width, depth) * B * N,
            bytes_accessed=B * (N + 10) * 4 + 120_000 * 2,
            transcendentals=B * N * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=mk.INTERPRET,
    )(origins, dirs, ts, *sels, *ws, *bs)


@functools.partial(jax.jit, static_argnames=("ray_tile", "compute_dtype",
                                             "depth"))
def _prop_ray_backward(ws, bs, origins, dirs, ts, g_sigma, g_r, g_g, g_b,
                       ray_tile: int, depth: int,
                       compute_dtype=jnp.bfloat16):
    B, N = ts.shape
    grid = (B // ray_tile,)
    ray3 = pl.BlockSpec((ray_tile, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayn = pl.BlockSpec((ray_tile, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    sels = [jnp.asarray(_POINT_SEL), jnp.asarray(_DIR_SEL)]
    width = ws[0].shape[1]
    wsigT = ws[depth].T                                    # (1, width)
    wceT = ws[depth + 1].T                                 # (3, 24)
    wchT = ws[depth + 2].T                                 # (3, width)

    dw_shapes = ([jax.ShapeDtypeStruct(ws[i].shape, jnp.float32)
                  for i in range(depth)]
                 + [jax.ShapeDtypeStruct(wsigT.shape, jnp.float32),
                    jax.ShapeDtypeStruct(wceT.shape, jnp.float32),
                    jax.ShapeDtypeStruct(wchT.shape, jnp.float32)])
    db_shapes = ([jax.ShapeDtypeStruct(bs[i].shape, jnp.float32)
                  for i in range(depth)]
                 + [jax.ShapeDtypeStruct((1, 1), jnp.float32),
                    jax.ShapeDtypeStruct((1, 3), jnp.float32)])
    out_shapes = ([jax.ShapeDtypeStruct((B, 3), jnp.float32)] * 2
                  + [jax.ShapeDtypeStruct((B, N), jnp.float32)]
                  + dw_shapes + db_shapes)
    out_specs = ([ray3, ray3, rayn]
                 + [full(s) for s in dw_shapes + db_shapes])

    outs = pl.pallas_call(
        functools.partial(_prop_ray_bwd_kernel, dtype=compute_dtype,
                          depth=depth),
        grid=grid,
        in_specs=[ray3, ray3, rayn, rayn, rayn, rayn, rayn]
        + [full(a) for a in sels + [wsigT, wceT, wchT] + ws + bs],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _prop_flops_per_row(width, depth) * B * N,
            bytes_accessed=B * (2 * N + 16) * 4 + 120_000 * 6,
            transcendentals=B * N * (3 * (L_POINT + L_DIR) * 2 + 4)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=mk.INTERPRET,
    )(origins, dirs, ts, g_sigma, g_r, g_g, g_b, *sels, wsigT, wceT, wchT,
      *ws, *bs)

    d_o, d_d, d_ts = outs[0], outs[1], outs[2]
    k = 3
    dws = outs[k:k + depth]
    dwsigT, dwceT, dwchT = outs[k + depth:k + depth + 3]
    k = k + depth + 3
    dbs = outs[k:k + depth]
    dbsigT, dbcT = outs[k + depth], outs[k + depth + 1]

    grads = {"trunk_0": {"w": dws[0][_POINT_INV], "b": dbs[0]},
             "sigma": {"w": dwsigT.T, "b": dbsigT.reshape(1)},
             "color": {"w": jnp.concatenate(
                 [dwceT.T[_DIR_INV], dwchT.T], axis=0),
                 "b": dbcT.reshape(3)}}
    for i in range(1, depth):
        grads[f"trunk_{i}"] = {"w": dws[i], "b": dbs[i]}
    return d_o, d_d, d_ts, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _prop_ray_field(params, origins, dirs, ts, compute_dtype):
    depth = _depth(params)
    rt = _ray_tile(ts.shape[1])
    o_p, B = _pad_rays(origins, rt)
    d_p, _ = _pad_rays(dirs, rt)
    t_p, _ = _pad_rays(ts, rt)
    ws, bs = pack_prop(params, compute_dtype)
    sigma, r, g, b = _prop_ray_forward(ws, bs, o_p, d_p, t_p, ray_tile=rt,
                                       depth=depth,
                                       compute_dtype=compute_dtype)
    return (r[:B], g[:B], b[:B]), sigma[:B]


def _prop_ray_field_fwd(params, origins, dirs, ts, compute_dtype):
    out = _prop_ray_field(params, origins, dirs, ts, compute_dtype)
    return out, (params, origins, dirs, ts)


def _prop_ray_field_bwd(compute_dtype, residuals, cotangents):
    params, origins, dirs, ts = residuals
    (g_r, g_g, g_b), g_sigma = cotangents
    depth = _depth(params)
    B, N = ts.shape
    rt = _ray_tile(N)
    o_p, _ = _pad_rays(origins, rt)
    d_p, _ = _pad_rays(dirs, rt)
    t_p, _ = _pad_rays(ts, rt)
    gs_p, _ = _pad_rays(g_sigma, rt)
    gr_p, _ = _pad_rays(g_r, rt)
    gg_p, _ = _pad_rays(g_g, rt)
    gb_p, _ = _pad_rays(g_b, rt)
    ws, bs = pack_prop(params, compute_dtype)
    d_o, d_d, d_ts, grads = _prop_ray_backward(
        ws, bs, o_p, d_p, t_p, gs_p, gr_p, gg_p, gb_p, ray_tile=rt,
        depth=depth, compute_dtype=compute_dtype)
    return grads, d_o[:B], d_d[:B], d_ts[:B]


_prop_ray_field.defvjp(_prop_ray_field_fwd, _prop_ray_field_bwd)


def prop_field_pallas_rays(params, origins: jnp.ndarray, dirs: jnp.ndarray,
                           ts: jnp.ndarray, compute_dtype=jnp.bfloat16,
                           ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Ray-major fused proposal field: origins/dirs (B, 3), ts (B, N) ->
    ((r, g, b), sigma) as dense (B, N) planes (renderer-tail layout)."""
    return _prop_ray_field(params, origins.astype(jnp.float32),
                           dirs.astype(jnp.float32), ts.astype(jnp.float32),
                           compute_dtype)


def prop_field_pallas(params, points: jnp.ndarray, dirs: jnp.ndarray,
                      compute_dtype=jnp.bfloat16,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat FieldFn variant (points/dirs (..., 3) -> (color, sigma)) — rides
    the ray kernel with one sample per ray at t=0 (origin == point), so the
    VJP to points/dirs falls out of the ray chain rule (t=0 makes
    d_origin = d_point and kills the t term in d_dir)."""
    lead = points.shape[:-1]
    pts = points.reshape(-1, 3).astype(jnp.float32)
    drs = dirs.reshape(-1, 3).astype(jnp.float32)
    ts = jnp.zeros((pts.shape[0], 1), jnp.float32)
    (r, g, b), sigma = _prop_ray_field(params, pts, drs, ts, compute_dtype)
    color = jnp.concatenate([r, g, b], axis=-1)
    return color.reshape(*lead, 3), sigma.reshape(*lead, 1)
