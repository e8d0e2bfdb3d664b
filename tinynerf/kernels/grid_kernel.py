"""Fused Pallas kernels for the factorized CP grid field (core/gridfield.py).

Why a kernel when the jnp grid path is "exactly the shape XLA fuses well"
(train.make_field_fn): the hat-basis formulation's ONE expensive artifact is
the (rows, R) basis matrix itself. XLA cannot fuse a computed operand into a
dot on TPU — the basis is materialized to HBM before every interpolation
matmul and read back by it, and the backward re-materializes it again for
the two VJP matmuls. At production shapes (4096 rays x 192 samples, R = 256)
that is ~2.4 GB of pure-scaffolding HBM traffic per training step in a field
whose actual parameters are ~100 KB — the all-grid step is bandwidth-bound
at ~15% MXU utilization. Inside the kernel the basis lives and dies in VMEM:
HBM sees per-ray geometry in, (B, N) planes out, and the line tables (which
fit VMEM whole ~240 KB).

Same architecture as the fused MLP kernels (kernels/mlp_kernel.py, the
measured house patterns):

- ray-major grid: each step processes a (ray_tile, N) block, expanding
  ``origin + t * dir`` in VMEM so (rows, 3) coordinate tensors never touch
  HBM (XLA tiles them at 3/128 lane occupancy);
- every per-sample scalar crosses HBM as a dense (B, N) plane (sigma + three
  color channels) — the renderer-tail layout invariant;
- backward recomputes the forward per tile and accumulates table/decoder
  grads across grid steps into f32 output blocks (init at program_id 0);
- head-cotangent (B, N) planes enter the rows-major chain through
  outer-product bridges (lanes->sublanes reshapes are unsupported);
- the direction encoding is per-RAY (24 dims), so it is computed OUTSIDE the
  kernel in XLA at (B, 24) cost and its cotangent is returned per ray —
  transcendentals inside the kernel grid serialize (the proposal-kernel
  lesson), so the kernel contains none on the hot path (3 sigmoids/sample
  excepted).

The CP field math being fused (reference provenance: the *field contract*
is the reference's coarse/fine query, /root/reference/nerf.py:288-321; the
factorized field itself has no reference counterpart):

    xg_a  = clip((p_a + E) / 2E, 0, 1) * (R - 1)            a in {x, y, z}
    U_a   = relu(1 - |xg_a - iota(R)|)          # 2-nonzero hat basis
    f_a   = U_a @ T_a                           # the lerp, on the MXU
    prod  = f_x * f_y * f_z
    sigma = |sum(prod[:, :nd])|
    h     = relu([dir_enc, prod[:, nd:]] @ W1 + b1)
    rgb   = sigmoid(h @ W2 + b2)

and its VJP (all matmuls, accumulated in f32):

    dT_a  = U_a^T @ (dprod * f_b * f_c)
    dU_a  = (dprod * f_b * f_c) @ T_a^T
    dxg_a = sum(dU_a * -sign(xg_a - iota) * [|xg_a - iota| < 1])
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinynerf.core import encoding
from tinynerf.core.encoding import DIR_ENC_DIM
# single interpreter switch for the whole kernel suite (tests flip it)
from tinynerf.kernels import mlp_kernel as mk

# Conservative VMEM budget: the kernels need ~8 MB; a higher limit starves
# the XLA fusions AROUND the call (the whole-frame lax.map OOM lesson,
# kernels/render_kernel.py STATUS).
_VMEM_LIMIT = 64 * 1024 * 1024


def _prec(dtype):
    """HIGHEST for f32 (TPU default multiplies f32 at bf16 precision);
    bf16 inputs take one MXU pass either way."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def pack_grid_params(params, compute_dtype):
    """Grid-field pytree -> flat operand dict in kernel layouts.

    Line tables cast to the compute dtype ((R, F) each); decoder weights
    cast with biases reshaped 2-D; ``w2T`` is the transposed color head for
    the backward's outer-product bridge; extent rides as (1, 1) f32 (kernels
    cannot capture array constants — CLAUDE.md pitfall list)."""
    cast = lambda a: a.astype(compute_dtype)
    dec = params["decoder"]
    return {
        "tx": cast(params["lines"]["x"]),
        "ty": cast(params["lines"]["y"]),
        "tz": cast(params["lines"]["z"]),
        "w1": cast(dec["hidden"]["w"]),
        "b1": dec["hidden"]["b"].reshape(1, -1).astype(jnp.float32),
        "w2": cast(dec["color"]["w"]),
        "w2T": cast(dec["color"]["w"].T),
        "b2": dec["color"]["b"].reshape(1, -1).astype(jnp.float32),
        "ext": params["extent"].reshape(1, 1).astype(jnp.float32),
    }


def _expand_points(o, d, t):
    """(RT, 3) origins/dirs + (RT, N) ts -> (RT*N, 3) points, VMEM-local.
    Leading-dims reshape only (the Mosaic-safe kind)."""
    rt, n = t.shape
    return (o[:, None, :] + t[..., None] * d[:, None, :]).reshape(rt * n, 3)


def _grid_coords(pts, ext, res):
    """World points -> f32 grid coords in [0, res-1] (bf16 cannot hold
    sub-cell offsets; matches gridfield._line_features)."""
    raw = (pts.astype(jnp.float32) + ext) / (2.0 * ext)
    return jnp.clip(raw, 0.0, 1.0) * (res - 1), raw


def _hat(xg_col, res, dtype):
    """(rows, 1) grid coords -> (rows, res) hat-basis weights, built in VMEM
    from a broadcasted iota (f32 compare — no bf16 compares on TPU).
    Mosaic only lowers integer iota ('tpu.iota' rejects float results),
    so build int32 and convert."""
    rows = xg_col.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, res), 1).astype(jnp.float32)
    return jax.nn.relu(1.0 - jnp.abs(xg_col - idx)).astype(dtype)


def _mm(a, b, dtype):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32,
                       precision=_prec(dtype))


def _mmT(a, b, dtype):
    """a @ b^T with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec(dtype))


def _mTm(a, b, dtype):
    """a^T @ b with f32 accumulation (grad-of-weights contraction)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec(dtype))


def _forward_tile(o, d, t, de, ext, tabs, w1, b1, w2, b2, dtype, nd,
                  keep_acts=False):
    """Shared fwd body: per-tile geometry -> (color (rows, 3) f32,
    sigma_pre (rows, 1) f32[, activations for the backward])."""
    rt, n = t.shape
    rows = rt * n
    res = tabs[0].shape[0]
    pts = _expand_points(o, d, t)
    xg, raw = _grid_coords(pts, ext, res)
    us, feats = [], []
    for a in range(3):
        u = _hat(xg[:, a:a + 1], res, dtype)
        us.append(u)
        feats.append(_mm(u, tabs[a], dtype).astype(dtype))
    prod = feats[0] * feats[1] * feats[2]                  # (rows, F) dtype
    sig_pre = jnp.sum(prod[:, :nd].astype(jnp.float32), axis=-1,
                      keepdims=True)                       # (rows, 1) f32
    app = prod[:, nd:]
    de_b = jnp.broadcast_to(de[:, None, :].astype(dtype),
                            (rt, n, de.shape[-1])).reshape(rows, -1)
    hin = jnp.concatenate([de_b, app], axis=-1)            # dir first
    h_pre = _mm(hin, w1, dtype) + b1                       # f32
    h = jax.nn.relu(h_pre)
    col_pre = _mm(h.astype(dtype), w2, dtype) + b2         # (rows, 3) f32
    color = jax.nn.sigmoid(col_pre)
    if keep_acts:
        return color, sig_pre, (pts, xg, raw, us, feats, prod, app, hin, h,
                                h_pre)
    return color, sig_pre


def _fwd_kernel(*refs, dtype, nd):
    (o_ref, d_ref, ts_ref, de_ref, ext_ref,
     tx_ref, ty_ref, tz_ref, w1_ref, b1_ref, w2_ref, b2_ref) = refs[:12]
    sigma_ref = refs[-4]
    col_refs = refs[-3:]
    t = ts_ref[:]
    ext = ext_ref[0, 0]
    color, sig_pre = _forward_tile(
        o_ref[:], d_ref[:], t, de_ref[:], ext,
        (tx_ref[:], ty_ref[:], tz_ref[:]),
        w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:], dtype, nd)
    sigma_ref[:] = jnp.abs(sig_pre).astype(jnp.float32).reshape(t.shape)
    for c in range(3):
        col_refs[c][:] = color[:, c:c + 1].astype(jnp.float32).reshape(
            t.shape)


def _bwd_kernel(*refs, dtype, nd):
    (o_ref, d_ref, ts_ref, de_ref, gs_ref, g0_ref, g1_ref, g2_ref,
     ext_ref, tx_ref, ty_ref, tz_ref,
     w1_ref, b1_ref, w2_ref, w2T_ref, b2_ref) = refs[:17]
    (do_ref, dd_ref, dts_ref, dde_ref,
     dtx_ref, dty_ref, dtz_ref,
     dw1_ref, db1_ref, dw2T_ref, db2T_ref) = refs[17:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dtx_ref, dty_ref, dtz_ref, dw1_ref, db1_ref,
                  dw2T_ref, db2T_ref):
            r[:] = jnp.zeros_like(r)

    o, d, t, de = o_ref[:], d_ref[:], ts_ref[:], de_ref[:]
    ext = ext_ref[0, 0]
    rt, n = t.shape
    rows = rt * n
    tabs = (tx_ref[:], ty_ref[:], tz_ref[:])
    res = tabs[0].shape[0]
    w1, b1, w2, b2 = w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:]
    w2T = w2T_ref[:].astype(jnp.float32)                    # (3, W)
    de_dim = de.shape[-1]

    # ---- recompute forward with activations ----
    color, sig_pre, (pts, xg, raw, us, feats, prod, app, hin, h, h_pre) = \
        _forward_tile(o, d, t, de, ext, tabs, w1, b1, w2, b2, dtype, nd,
                      keep_acts=True)

    cast = lambda x: x.astype(dtype)
    width = h.shape[-1]

    # ---- color head via per-channel (RT, N) bridges ----
    h_3d = h.reshape(rt, n, width)
    g_h_f32 = jnp.zeros((rows, width), jnp.float32)
    for c, gc_ref in enumerate((g0_ref, g1_ref, g2_ref)):
        col_c = color[:, c:c + 1].astype(jnp.float32).reshape(rt, n)
        gp = gc_ref[:] * col_c * (1.0 - col_c)              # sigmoid'
        dw2T_ref[c:c + 1, :] += jnp.sum(
            h_3d.astype(jnp.float32) * gp[:, :, None], axis=(0, 1),
            dtype=jnp.float32).reshape(1, width)
        db2T_ref[:, c:c + 1] += jnp.sum(
            jnp.sum(gp, axis=1, keepdims=True), axis=0, keepdims=True)
        g_h_f32 = g_h_f32 + (gp[:, :, None]
                             * w2T[c][None, None, :]).reshape(rows, width)

    g_h = cast(g_h_f32 * (h_pre > 0.0).astype(jnp.float32))  # relu'
    dw1_ref[:] += _mTm(hin, g_h, dtype)
    db1_ref[:] += jnp.sum(g_h.astype(jnp.float32), axis=0, keepdims=True)
    g_in = _mmT(g_h, w1, dtype)                             # (rows, IN) f32
    dde_ref[:] = jnp.sum(g_in[:, :de_dim].reshape(rt, n, de_dim), axis=1)
    g_app = cast(g_in[:, de_dim:])                          # (rows, Fa)

    # ---- sigma via the (RT, N) bridge: dprod over density components ----
    gs = gs_ref[:] * jnp.sign(sig_pre.reshape(rt, n))       # f32 (RT, N)
    dprod_d = cast(jnp.broadcast_to(gs[:, :, None],
                                    (rt, n, nd)).reshape(rows, nd))
    dprod = jnp.concatenate([dprod_d, g_app], axis=-1)      # (rows, F) dtype

    # ---- per-axis table grads + coordinate grads ----
    pair = (feats[1] * feats[2], feats[0] * feats[2], feats[0] * feats[1])
    dtab_refs = (dtx_ref, dty_ref, dtz_ref)
    # int32 iota -> f32: Mosaic's 'tpu.iota' rejects float results.
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, res), 1).astype(jnp.float32)
    dpts = []
    for a in range(3):
        dfa = dprod * pair[a]                               # (rows, F) dtype
        dtab_refs[a][:] += _mTm(us[a], dfa, dtype)
        du = _mmT(dfa, tabs[a], dtype)                      # (rows, R) f32
        diff = xg[:, a:a + 1] - idx                         # f32
        # d/dxg relu(1 - |diff|), composed with JAX's own sub-gradient
        # conventions so exact grid-node hits differentiate identically to
        # the jnp field: abs'(0) = +1 (lax.abs JVP), relu'(0) = 0.
        dabs = jnp.where(diff >= 0.0, 1.0, -1.0)
        dhat = -dabs * ((1.0 - jnp.abs(diff)) > 0.0).astype(jnp.float32)
        dxg = jnp.sum(du * dhat, axis=-1, keepdims=True)    # (rows, 1) f32
        # clip VJP matching jnp.clip = min(max(x, 0), 1): 1 inside, 0.5 at
        # an exact boundary (lax.max/min split gradient at ties), 0 outside
        ra = raw[:, a:a + 1]
        m = (0.5 * ((ra >= 0.0) & (ra <= 1.0)).astype(jnp.float32)
             + 0.5 * ((ra > 0.0) & (ra < 1.0)).astype(jnp.float32))
        dpts.append(dxg * m * ((res - 1) / (2.0 * ext)))
    d_pts3 = jnp.concatenate(dpts, axis=-1).reshape(rt, n, 3)

    # chain rule through pts = o + t*d: per-ray / per-sample reductions in
    # VMEM — (RT, N)/(RT, 3) is what hits HBM, never (rows, 3)
    dts_ref[:] = jnp.sum(d_pts3 * d[:, None, :], axis=2)    # (RT, N)
    do_ref[:] = jnp.sum(d_pts3, axis=1)                     # (RT, 3)
    dd_ref[:] = jnp.sum(d_pts3 * t[..., None], axis=1)      # (RT, 3)


def _ray_tile(n_samples: int) -> int:
    """Rays per grid step: ~1024 sample rows per tile (the measured MLP-
    kernel sweet spot), rounded to 8 sublanes."""
    rt = max(1, 1024 // n_samples)
    return ((rt + 7) // 8) * 8


def _pad_rays(x, rt):
    b = x.shape[0]
    pad = (-b) % rt
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, b


def _flops_per_row(res, n_comp, de_dim, width) -> int:
    per_row = (3 * res * n_comp                    # hat-basis lerp matmuls
               + (de_dim + n_comp) * width         # decoder hidden
               + width * 3)                        # color head
    return 2 * per_row


@functools.partial(jax.jit, static_argnames=("ray_tile", "nd",
                                             "compute_dtype"))
def _fused_ray_forward(packed, origins, dirs, ts, de, ray_tile: int,
                       nd: int, compute_dtype=jnp.bfloat16):
    """origins/dirs (B, 3), ts (B, N), de (B, 24) -> (sigma, r, g, b) each
    dense (B, N). B % ray_tile == 0."""
    B, N = ts.shape
    grid = (B // ray_tile,)
    ray3 = pl.BlockSpec((ray_tile, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayn = pl.BlockSpec((ray_tile, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayde = pl.BlockSpec((ray_tile, DIR_ENC_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    ops = [packed[k] for k in ("ext", "tx", "ty", "tz", "w1", "b1", "w2",
                               "b2")]
    res, n_comp = packed["tx"].shape
    width = packed["w1"].shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, dtype=compute_dtype, nd=nd),
        grid=grid,
        in_specs=[ray3, ray3, rayn, rayde] + [full(a) for a in ops],
        out_specs=[rayn] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=_flops_per_row(res, n_comp, DIR_ENC_DIM, width) * B * N,
            bytes_accessed=B * (5 * N + 30) * 4 + 3 * res * n_comp * 4,
            transcendentals=B * N * 3),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=mk.INTERPRET,
    )(origins, dirs, ts, de, *ops)


@functools.partial(jax.jit, static_argnames=("ray_tile", "nd",
                                             "compute_dtype"))
def _fused_ray_backward(packed, origins, dirs, ts, de, g_sigma, g_r, g_g,
                        g_b, ray_tile: int, nd: int,
                        compute_dtype=jnp.bfloat16):
    """Per-channel (B, N) cotangents -> (d_o, d_d, d_ts, d_de, dtabs,
    decoder grads). The color-head grads come back transposed (``dw2T``/
    ``db2T``) and are restored by the caller."""
    B, N = ts.shape
    grid = (B // ray_tile,)
    ray3 = pl.BlockSpec((ray_tile, 3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayn = pl.BlockSpec((ray_tile, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    rayde = pl.BlockSpec((ray_tile, DIR_ENC_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    ops = [packed[k] for k in ("ext", "tx", "ty", "tz", "w1", "b1", "w2",
                               "w2T", "b2")]
    res, n_comp = packed["tx"].shape
    in_dim, width = packed["w1"].shape

    acc = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    out_shapes = [acc((B, 3)), acc((B, 3)), acc((B, N)),
                  acc((B, DIR_ENC_DIM)),
                  acc((res, n_comp)), acc((res, n_comp)), acc((res, n_comp)),
                  acc((in_dim, width)), acc((1, width)),
                  acc((3, width)), acc((1, 3))]
    out_specs = ([ray3, ray3, rayn, rayde]
                 + [full(s) for s in out_shapes[4:]])

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dtype=compute_dtype, nd=nd),
        grid=grid,
        in_specs=[ray3, ray3, rayn, rayde, rayn, rayn, rayn, rayn]
        + [full(a) for a in ops],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=3 * _flops_per_row(res, n_comp, DIR_ENC_DIM, width) * B * N,
            bytes_accessed=B * (9 * N + 60) * 4 + 3 * res * n_comp * 8,
            transcendentals=B * N * 3),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=mk.INTERPRET,
    )(origins, dirs, ts, de, g_sigma, g_r, g_g, g_b, *ops)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _grid_ray_field(params, origins, dirs, ts, nd, compute_dtype):
    rt = _ray_tile(ts.shape[1])
    o_p, B = _pad_rays(origins, rt)
    d_p, _ = _pad_rays(dirs, rt)
    t_p, _ = _pad_rays(ts, rt)
    de = encoding.encode_dirs(dirs)                       # per-RAY, in XLA
    de_p, _ = _pad_rays(de, rt)
    packed = pack_grid_params(params, compute_dtype)
    sigma, r, g, b = _fused_ray_forward(packed, o_p, d_p, t_p, de_p,
                                        ray_tile=rt, nd=nd,
                                        compute_dtype=compute_dtype)
    return (r[:B], g[:B], b[:B]), sigma[:B]


def _grid_ray_field_fwd(params, origins, dirs, ts, nd, compute_dtype):
    out = _grid_ray_field(params, origins, dirs, ts, nd, compute_dtype)
    return out, (params, origins, dirs, ts)


def _grid_ray_field_bwd(nd, compute_dtype, residuals, cotangents):
    params, origins, dirs, ts = residuals
    (g_r, g_g, g_b), g_sigma = cotangents                 # each (B, N)
    B, N = ts.shape
    rt = _ray_tile(N)
    o_p, _ = _pad_rays(origins, rt)
    d_p, _ = _pad_rays(dirs, rt)
    t_p, _ = _pad_rays(ts, rt)
    de, de_vjp = jax.vjp(encoding.encode_dirs, dirs)
    de_p, _ = _pad_rays(de, rt)
    gs_p, _ = _pad_rays(g_sigma, rt)
    gr_p, _ = _pad_rays(g_r, rt)
    gg_p, _ = _pad_rays(g_g, rt)
    gb_p, _ = _pad_rays(g_b, rt)
    packed = pack_grid_params(params, compute_dtype)
    (d_o, d_d, d_ts, d_de, dtx, dty, dtz, dw1, db1, dw2T, db2T) = \
        _fused_ray_backward(packed, o_p, d_p, t_p, de_p, gs_p, gr_p, gg_p,
                            gb_p, ray_tile=rt, nd=nd,
                            compute_dtype=compute_dtype)
    d_d = d_d[:B] + de_vjp(d_de[:B])[0]                   # dir-encoding path
    d_params = {
        "lines": {"x": dtx, "y": dty, "z": dtz},
        "decoder": {
            "hidden": {"w": dw1, "b": db1.reshape(-1)},
            "color": {"w": dw2T.T, "b": db2T.reshape(-1)},
        },
        # frozen geometry (stop_gradient'd in the jnp path too)
        "extent": jnp.zeros_like(params["extent"]),
    }
    return (d_params, d_o[:B], d_d, d_ts[:B])


_grid_ray_field.defvjp(_grid_ray_field_fwd, _grid_ray_field_bwd)


def grid_field_pallas_rays(params, origins: jnp.ndarray, dirs: jnp.ndarray,
                           ts: jnp.ndarray, n_density: int,
                           compute_dtype=jnp.bfloat16,
                           ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Ray-major fused CP-grid field: evaluates the factorized field at
    ``origin + t * dir`` for every (ray, sample) pair. origins/dirs (B, 3),
    ts (B, N) -> ((r, g, b), sigma), every output a dense (B, N) plane.

    The hat-basis matrices — the jnp path's dominant HBM artifact — exist
    only in VMEM here; gradients flow to the line tables, decoder, origins,
    dirs (incl. the direction-encoding path) and ts (the Q8 resampler
    leak)."""
    return _grid_ray_field(params, origins.astype(jnp.float32),
                           dirs.astype(jnp.float32), ts.astype(jnp.float32),
                           n_density, compute_dtype)
