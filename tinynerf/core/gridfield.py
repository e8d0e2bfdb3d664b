"""Factorized feature-grid radiance field (CP decomposition), TPU-native.

Opt-in fine-pass field (``FINE_FIELD = grid``): replaces the 593,924-param
reference MLP (``nerf.py:76-124``) with a TensoRF-CP-style factorized
volume — per-axis 1-D feature lines whose per-component products give
density and appearance features, plus a small view-dependent decoder. The
reference has nothing like this; it is the framework's second model family
and the FLOP-reduction lever CLAUDE.md names: at the defaults the fine
field costs ~66k MACs/sample vs the big MLP's ~508k (≈7.7x fewer), with
quality carried by the grid's spatial capacity instead of network depth.

TPU-first design decisions:

- **No gathers in the hot path.** A grid lookup is canonically a gather of
  2 neighbours per axis; its backward is a scatter-add — both TPU-hostile
  (CLAUDE.md invariant). Here the 1-D linear interpolation is expressed as
  a *hat-basis matmul*: ``U[b, i] = relu(1 - |x_b * (R-1) - i|)`` has
  exactly the two interpolation weights as nonzeros, so ``U @ lines`` IS
  the lerp, runs on the MXU, and its VJP (``U^T @ dF``) is another matmul
  — the scatter-add a gather would need never exists. The U construction
  is a broadcasted-iota compare, which XLA fuses into the dot's operand.
- **One matmul per axis.** Density and appearance lines concatenate into
  a single (R, Fd+Fa) table per axis so each sample costs exactly three
  (B, R) @ (R, F) matmuls; features split after.
- **CP products are elementwise** (VPU, fused by XLA into the surrounding
  ops); there is no 3-D table anywhere, so HBM holds O(3·R·F) parameters
  (~100 KB) instead of O(R^3).
- A ``lookup="gather"`` variant exists purely to measure the gather
  formulation against this design on real hardware.

Interpolation uses f32 coordinates regardless of compute dtype (bf16's
8-bit mantissa cannot represent ``x*(R-1)`` to sub-cell precision; same
reason the PE banks encode at f32 — see train.make_field_fn).

Sigma uses the framework's abs activation (Q14 house convention; unlike
ReLU it has no dead half-space at init). The grid trains with a per-leaf
LR multiplier (``GRID_LR_MULT``, optim.adam_update lr_scale) because
factorized tables want ~10-40x the MLP learning rate, and an optional
total-variation regularizer (``GRID_TV``) smooths the lines.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from tinynerf.core import encoding
from tinynerf.core.encoding import DIR_ENC_DIM
from tinynerf.core.mlp import _linear, _linear_init

RES = 256             # line resolution R (cells per axis)
N_COMP_DENSITY = 32   # CP components for density
N_COMP_APP = 48       # CP components for appearance
DECODER_WIDTH = 64
EXTENT = 1.5          # grid half-extent in world units (matches occ default)
INIT_SCALE = 0.2      # line init stddev (TensoRF-style)

AXES = ("x", "y", "z")

Params = Dict[str, Any]


def init_grid_field(key: jax.Array, res: int = RES,
                    n_density: int = N_COMP_DENSITY, n_app: int = N_COMP_APP,
                    decoder_width: int = DECODER_WIDTH,
                    extent: float = EXTENT,
                    init_scale: float = INIT_SCALE,
                    hybrid: bool = False,
                    sigma_width: int = 0,
                    levels: int = 1) -> Params:
    """Parameter pytree: 3 per-axis line tables + the color decoder.

    Each line table is (res, n_density + n_app); density components occupy
    the leading columns. At the defaults: 3*256*80 = 61,440 line params +
    ~6.1k decoder params.

    ``hybrid=True`` (``GRID_HYBRID``) adds an Instant-NGP-style tiny
    density MLP on the CP density product — sigma = abs(Linear(relu(
    Linear(prod)))) — whose hidden features also feed the color decoder.
    Pure CP sums density components independently; the MLP mixes them
    (cross-component interactions), the capacity pure factorizations
    lack. Its leaves live OUTSIDE ``lines`` so they train at the base LR
    (make_lr_scale routes the GRID_LR_MULT by path). ``sigma_width``
    sizes its hidden layer independently (0 = decoder_width).

    ``levels > 1`` (``GRID_LEVELS``) builds a multi-resolution pyramid:
    level l adds a per-axis table ``lines[f"{ax}{l}"]`` at
    ``((res-1) >> l) + 1`` (halved INTERVALS — equals ``res >> l`` for
    even res, and nests exactly for odd res like 385 -> 193)
    whose interpolated features SUM with level 0's before the CP product.
    Extra levels are ZERO-initialized, so a levels=L field starts exactly
    equal to the levels=1 field (their gradients differ — the coarser hat
    bases spread each sample's gradient over wider support, the smooth
    prior the flat-res ladder lacks). Living inside ``lines`` they inherit
    GRID_LR_MULT and checkpointing for free."""
    n_comp = n_density + n_app
    kx, ky, kz, k1, k2, k3, k4 = jax.random.split(key, 7)
    lines = {ax: init_scale * jax.random.normal(k, (res, n_comp), jnp.float32)
             for ax, k in zip(AXES, (kx, ky, kz))}
    for lvl in range(1, levels):
        # halve INTERVALS, not nodes: ((res-1) >> lvl) + 1 equals res >> lvl
        # for even res (every measured config unchanged) but makes odd
        # resolutions nest exactly — 385 -> 193 -> 97 has (R0-1) divisible
        # by (Rl-1), the condition under which GRID_LEVEL_FOLD represents
        # the identical piecewise-linear function
        res_l = max(2, ((res - 1) >> lvl) + 1)
        for ax in AXES:
            lines[f"{ax}{lvl}"] = jnp.zeros((res_l, n_comp), jnp.float32)
    sigma_width = sigma_width or decoder_width
    dec_in = DIR_ENC_DIM + n_app + (sigma_width if hybrid else 0)
    decoder = {
        "hidden": _linear_init(k1, dec_in, decoder_width),
        "color": _linear_init(k2, decoder_width, 3),
    }
    out = {"lines": lines, "decoder": decoder,
           # static geometry riding the pytree as an array so checkpoints
           # carry it (res/F are recoverable from the line shapes; extent
           # is not). stop_gradient'd at use, so its grads — and hence its
           # Adam updates — are identically zero.
           "extent": jnp.asarray(extent, jnp.float32),
    }
    if hybrid:
        out["sigma_net"] = {
            "hidden": _linear_init(k3, n_density, sigma_width),
            "sigma": _linear_init(k4, sigma_width, 1),
        }
    return out


def num_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def _hat_basis(xg: jnp.ndarray, res: int, dtype) -> jnp.ndarray:
    """(..., ) grid coords in [0, res-1] -> (..., res) hat-basis weights.

    Row b has nonzeros only at floor(xg_b) and floor(xg_b)+1, holding the
    two linear-interp weights. Built from a broadcasted iota compare so XLA
    can fuse it straight into the consuming dot."""
    idx = jax.lax.broadcasted_iota(jnp.float32, (*xg.shape, res),
                                   dimension=xg.ndim)
    return jax.nn.relu(1.0 - jnp.abs(xg[..., None] - idx)).astype(dtype)


def _line_features(lines: Dict[str, jnp.ndarray], points: jnp.ndarray,
                   extent: jnp.ndarray, lookup: str,
                   compute_dtype, fold: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Interpolate each axis's line table at the points' coordinates.

    points (..., 3) -> tuple of 3 arrays (..., F). Coordinates clamp to the
    grid boundary (points outside [-extent, extent] read the edge value).

    Pyramid tables (``lines["x1"]`` etc., GRID_LEVELS) interpolate at their
    own resolution and sum into the axis features. With ``fold=True``
    (GRID_LEVEL_FOLD) they are instead linearly upsampled onto the level-0
    lattice and SUMMED INTO THE TABLE before a single interpolation — an
    O(R0·Rl·F) matmul per axis per step (~6 MFLOP, invisible next to the
    ~32 GFLOP per-batch hat matmul it replaces), so a folded pyramid costs
    the same per sample as levels=1 instead of +sum(Rl)/R0 extra hat-matmul
    work. When the lattices nest (``(R0-1) % (Rl-1) == 0``) upsample-then-
    interpolate represents the exact same piecewise-linear function as
    interpolate-per-level (linear segments pass through interior fine
    nodes), and gradients reach the level tables through the upsample
    operator's transpose — the same linear map, so training dynamics match
    the unfolded path. Non-nested lattices (e.g. 384+192) differ by a
    double-interpolation smoothing; measure before swapping."""
    # extent is frozen geometry riding the param tree: without the detach,
    # grad would flow extent->xg->hat basis and force a per-axis
    # dU = dF @ table^T matmul that exists only to differentiate a constant
    extent = jax.lax.stop_gradient(extent)
    # f32 normalized coordinates in [0, 1] (bf16 cannot hold sub-cell
    # offsets once scaled by res-1)
    t01 = jnp.clip((points.astype(jnp.float32) + extent) / (2.0 * extent),
                   0.0, 1.0)

    def interp(table: jnp.ndarray, tc: jnp.ndarray) -> jnp.ndarray:
        res = table.shape[0]
        xg = tc * (res - 1)
        table = table.astype(compute_dtype)
        if lookup == "gather":
            # measurement-only variant: canonical 2-neighbour lerp; its VJP
            # scatter-adds into the table (the formulation the hat-basis
            # matmul exists to avoid)
            i0 = jnp.floor(xg)
            frac = (xg - i0).astype(compute_dtype)[..., None]
            i0 = i0.astype(jnp.int32)
            f0 = jnp.take(table, i0, axis=0)
            f1 = jnp.take(table, jnp.minimum(i0 + 1, res - 1), axis=0)
            return f0 * (1.0 - frac) + f1 * frac
        u = _hat_basis(xg, res, compute_dtype)
        return jnp.matmul(u, table, precision=jax.lax.Precision.HIGHEST)

    feats = []
    for a, ax in enumerate(AXES):
        if fold:
            table = lines[ax]
            res0 = table.shape[0]
            lvl = 1
            while f"{ax}{lvl}" in lines:
                tl = lines[f"{ax}{lvl}"]
                up = upsample_matrix(tl.shape[0], res0)
                table = table + jnp.matmul(up, tl,
                                           precision=jax.lax.Precision.HIGHEST)
                lvl += 1
            feats.append(interp(table, t01[..., a]))
            continue
        f = interp(lines[ax], t01[..., a])
        lvl = 1
        while f"{ax}{lvl}" in lines:
            f = f + interp(lines[f"{ax}{lvl}"], t01[..., a])
            lvl += 1
        feats.append(f)
    return tuple(feats)


def apply_grid_field(params: Params, points: jnp.ndarray, dirs: jnp.ndarray,
                     n_density: int = N_COMP_DENSITY,
                     lookup: str = "onehot",
                     compute_dtype=jnp.float32,
                     fold: bool = False,
                     ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """FieldFn body: (..., 3) points/dirs -> (color channels x3, sigma (..., 1)).

    sigma = abs(sum_f fx_f * fy_f * fz_f) over the density components;
    color = sigmoid(Linear(relu(Linear([dir_enc, app_feat])))) where
    app_feat is the per-component CP product of the appearance columns.
    With a ``sigma_net`` in the param tree (GRID_HYBRID) sigma comes from
    the tiny density MLP instead and its hidden features join the color
    input (see init_grid_field)."""
    fx, fy, fz = _line_features(params["lines"], points, params["extent"],
                                lookup, compute_dtype, fold=fold)
    prod = fx * fy * fz                                   # (..., Fd+Fa)
    app = prod[..., n_density:]
    de = encoding.encode_dirs(dirs).astype(compute_dtype)
    if "sigma_net" in params:
        hs = jax.nn.relu(_linear(params["sigma_net"]["hidden"],
                                 prod[..., :n_density]))
        sigma = jnp.abs(_linear(params["sigma_net"]["sigma"], hs))
        color_in = jnp.concatenate([de, app, hs], axis=-1)
    else:
        sigma = jnp.abs(jnp.sum(prod[..., :n_density], axis=-1,
                                keepdims=True))
        color_in = jnp.concatenate([de, app], axis=-1)
    h = jax.nn.relu(_linear(params["decoder"]["hidden"], color_in))
    color = jax.nn.sigmoid(_linear(params["decoder"]["color"], h))
    color_c = tuple(color[..., c].astype(jnp.float32) for c in range(3))
    return color_c, sigma.astype(jnp.float32)


def make_field_grid(n_density: int = N_COMP_DENSITY, lookup: str = "onehot",
                    compute_dtype=None, fold: bool = False):
    """FieldFn factory (same contract as ``render.field_jnp``)."""
    dtype = jnp.float32 if compute_dtype is None else compute_dtype

    def field(params: Params, points: jnp.ndarray, dirs: jnp.ndarray):
        return apply_grid_field(params, points, dirs, n_density=n_density,
                                lookup=lookup, compute_dtype=dtype, fold=fold)

    return field


def upsample_matrix(old_res: int, new_res: int) -> jnp.ndarray:
    """(new_res, old_res) linear-interpolation operator between lattices.

    Row j holds the hat-basis weights of new node j (at ``j*(R-1)/(R'-1)``
    in old-lattice coordinates) — the exact operator the field itself uses
    to read the lines, so upsampling commutes with evaluation: when the new
    lattice contains the old nodes (``(new-1) % (old-1) == 0``) the
    represented piecewise-linear function is preserved bit-for-bit in
    exact arithmetic."""
    new_x = jnp.linspace(0.0, float(old_res - 1), new_res)
    idx = jnp.arange(old_res, dtype=jnp.float32)
    return jax.nn.relu(1.0 - jnp.abs(new_x[:, None] - idx[None, :]))


def upsample_lines(params: Params, new_res: int) -> Params:
    """Coarse-to-fine resolution step (TensoRF-style): resize each per-axis
    line table (R, F) -> (new_res, F) by linear interpolation on the MXU.
    Decoder/extent leaves pass through untouched. Works on any pytree with
    the grid-field layout — Adam moment trees included (they live on the
    same lattice as their parameters). Pyramid fields (GRID_LEVELS > 1)
    are rejected: the levels already span resolutions, and resampling each
    would silently change their relative bandwidths."""
    if any(k not in AXES for k in params["lines"]):
        raise ValueError("GRID_UPSAMPLE is incompatible with GRID_LEVELS>1 "
                         "(multi-resolution pyramid)")
    old_res = params["lines"][AXES[0]].shape[0]
    if new_res == old_res:
        return params
    w = upsample_matrix(old_res, new_res)
    out = dict(params)
    out["lines"] = {ax: jnp.matmul(w, params["lines"][ax],
                                   precision=jax.lax.Precision.HIGHEST)
                    for ax in AXES}
    return out


def tv_loss(params: Params) -> jnp.ndarray:
    """Total-variation regularizer over the line tables: mean squared
    difference of adjacent entries, summed over the three axes (and every
    pyramid level, GRID_LEVELS). O(levels*3*R*F) elementwise — negligible
    next to the field evaluation."""
    total = jnp.asarray(0.0, jnp.float32)
    for name in sorted(params["lines"]):
        t = params["lines"][name]
        total = total + jnp.mean(jnp.square(t[1:] - t[:-1]))
    return total
