"""Occupancy-grid empty-space skipping (opt-in acceleration).

A NerfAcc-style coarse density grid (cf. PAPERS.md: "NerfAcc: Efficient
Sampling Accelerates NeRFs"), adapted to TPU constraints: instead of
compacting samples into dynamic-length segments (shape-dynamic, hostile to
XLA), the grid TIGHTENS each ray's [near, far] interval to the span of
occupied cells it crosses — sample counts stay static, but the same 64+128
samples concentrate on occupied space, buying reconstruction quality at
identical cost.

Everything is static-shape jnp: the grid update is one field evaluation over
the cell centers; the per-ray tightening is a fixed-step DDA-style march of
compares and min/max reductions. Rays that miss all occupied cells collapse
to an empty interval and composite to the background — which is why this
feature requires ``WHITE_BKGD = True`` for white-composited (sync) scenes:
the Runner rejects the OCC_GRID + sync + black-background combination.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class OccGrid(NamedTuple):
    density: jnp.ndarray   # (R, R, R) dilated query grid (what rays test)
    raw: jnp.ndarray       # (R, R, R) undilated EMA of sigma at cell centers
    half_extent: jnp.ndarray  # scalar: grid spans [-h, h]^3
    threshold: jnp.ndarray    # occupancy cutoff on sigma


def init_grid(resolution: int = 64, half_extent: float = 1.5,
              threshold: float = 0.01) -> OccGrid:
    # inf = "assume occupied": tighten_bounds is a no-op until cells are
    # actually probed, so a partially-refreshed grid is always conservative
    return OccGrid(
        density=jnp.full((resolution,) * 3, jnp.inf, jnp.float32),
        raw=jnp.full((resolution,) * 3, jnp.inf, jnp.float32),
        half_extent=jnp.asarray(half_extent, jnp.float32),
        threshold=jnp.asarray(threshold, jnp.float32))


def cell_centers(resolution: int, half_extent: jnp.ndarray) -> jnp.ndarray:
    """(R^3, 3) cell-center coordinates."""
    lin = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    lin = (lin * 2.0 - 1.0)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * half_extent


def _dilate(raw: jnp.ndarray) -> jnp.ndarray:
    """Conservative 3x3x3 dilation: a single jittered sample per cell can
    miss thin geometry at cell boundaries; taking the neighborhood max keeps
    surface-adjacent cells occupied (standard occupancy-grid practice).
    inf (never-probed) cells stay inf and spread — conservative."""
    return jax.lax.reduce_window(
        raw, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")


def update_grid(grid: OccGrid, params, field_fn, key: jax.Array,
                ema: float = 0.8, chunk: int = 65536,
                subset: Optional[int] = None,
                cell_sharding=None, contract: bool = False) -> OccGrid:
    """EMA-update the grid from the current field (one jittered sample per
    cell), then re-derive the dilated query grid.

    ``subset=None`` probes every cell (R^3 field evals — 262k for R=64).
    ``subset=K`` probes K uniformly-random cells (NerfAcc-style partial
    refresh, cf. PAPERS.md): per-refresh cost drops R^3/K-fold while every
    cell still gets re-probed every ~R^3/K refreshes in expectation.
    Untouched cells keep their EMA value (inf until first probe = occupied).

    ``cell_sharding`` (a NamedSharding over the leading axis, normally the
    train step's ray sharding) constrains the probe points so XLA
    partitions the field evals across the mesh — without it the refresh
    replicates R^3 MLP evals on every device of a pod.

    ``contract=True`` (unbounded-360 scenes, CONTRACT): the grid's cells
    live in the CONTRACTED radius-2 ball (``half_extent`` must be 2), but
    ``field_fn`` is the contracting wrapper taking WORLD points — so each
    probe maps its cell center back through the inverse contraction
    (core/contract.py) and the wrapper's forward warp lands exactly on the
    cell. Cells outside the reachable ball (cube corners, |c| >= 2) probe
    at the "infinity" clamp radius and read the far field there.
    """
    res = grid.density.shape[0]
    n_total = res ** 3
    cell = 2.0 * grid.half_extent / res

    def eval_sigma(p):
        if contract:
            from tinynerf.core.contract import inv_contract_mip360
            p = inv_contract_mip360(p)
        _c, sigma = field_fn(params, p, jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], p.dtype), p.shape))
        return jnp.squeeze(sigma, axis=-1)

    def eval_chunked(p):
        if cell_sharding is not None:
            p = jax.lax.with_sharding_constraint(p, cell_sharding)
        n = p.shape[0]
        if n > chunk and n % chunk == 0:
            return jax.lax.map(eval_sigma, p.reshape(-1, chunk, 3)).reshape(-1)
        return eval_sigma(p)

    if subset is None or subset >= n_total:
        kjit = key
        centers = cell_centers(res, grid.half_extent)
        jitter = (jax.random.uniform(kjit, centers.shape) - 0.5) * cell
        sig = eval_chunked(centers + jitter)
        new = sig.reshape(grid.raw.shape)
        old = jnp.where(jnp.isinf(grid.raw), new, grid.raw)
        raw = ema * old + (1.0 - ema) * new
    else:
        kidx, kjit = jax.random.split(key)
        flat_idx = jax.random.randint(kidx, (subset,), 0, n_total)
        # decode x-major flat index (matches tighten_bounds' layout)
        ix = flat_idx // (res * res)
        iy = (flat_idx // res) % res
        iz = flat_idx % res
        idx3 = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
        ctr = ((idx3 + 0.5) / res * 2.0 - 1.0) * grid.half_extent
        pts = ctr + (jax.random.uniform(kjit, ctr.shape) - 0.5) * cell
        sig = eval_chunked(pts)
        old_vals = grid.raw.reshape(-1)[flat_idx]
        upd = jnp.where(jnp.isinf(old_vals), sig,
                        ema * old_vals + (1.0 - ema) * sig)
        raw = grid.raw.reshape(-1).at[flat_idx].set(upd).reshape(
            grid.raw.shape)
    return grid._replace(raw=raw, density=_dilate(raw))


def derive_march_steps(resolution: int, half_extent: float, ray_span: float,
                       safety: float = 1.25) -> int:
    """Probe count for :func:`tighten_bounds` guaranteed not to skip occupied
    space for rays marching up to ``ray_span = max(far - near)`` world units.

    The query grid is 3x3x3-dilated, so every occupied run spans at least
    3 cells = ``6 * half_extent / resolution`` along the march; the probe
    spacing ``ray_span / n_steps`` must stay below that with a safety factor.
    The Runner calls this at setup with the scene's actual pose bounds
    (``OCC_MARCH_STEPS`` in the INI overrides).
    """
    margin = 6.0 * half_extent / resolution
    needed = int(-(-ray_span * safety // margin))  # ceil
    return max(64, needed)


def derive_march_steps_contracted(resolution: int, near: float,
                                  far: float, safety: float = 1.25) -> int:
    """Probe count for the CONTRACTED grid's disparity-spaced march.

    Disparity-uniform probes have (exactly) uniform contracted-RADIAL
    spacing ``(1/near - 1/far) / n`` (for ``t > 1``, ``r_c = 2 - 1/t``),
    so the 3-cell dilation margin ``6 * 2 / resolution`` bounds ``n`` the
    same way the linear march's bound works for bounded grids. Tangential
    contracted motion is not bounded by disparity spacing in theory; the
    3x3x3 dilation plus the per-probe local-spacing margin absorb it in
    practice (asserted empirically by tests/test_occupancy.py's
    never-excludes-occupied test on contracted scenes)."""
    span = 1.0 / max(near, 1e-6) - 1.0 / max(far, 1e-6)
    margin = 6.0 * 2.0 / resolution
    return max(64, int(-(-span * safety // margin)))


def tighten_bounds(grid: OccGrid, origins: jnp.ndarray, dirs: jnp.ndarray,
                   near: jnp.ndarray, far: jnp.ndarray,
                   n_steps: Optional[int] = None,
                   contract: bool = False, lindisp: bool = False,
                   march_res: Optional[int] = None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray [near, far] -> the sub-interval covering occupied cells.

    Fixed-count march (static shapes): probe n_steps points along each ray,
    look up occupancy, take (first, last) occupied probe with a margin of at
    least one grid-cell diagonal. Rays hitting nothing collapse to a tiny
    interval at `far` (the background term handles them).
    Differentiation-free (stop_gradient'd bounds, like any sampling schedule).

    ``n_steps`` defaults to ``max(64, resolution)`` — only safe when
    ``far - near < 6 * half_extent`` (probe spacing below the 3-cell
    dilation margin); callers with scene knowledge should pass the output
    of :func:`derive_march_steps` instead, which enforces that bound from
    the actual ray span (the Runner does). Measured
    in-step on v5e (B=4096, 64+128 samples): the probe gather costs ~68 us
    per probe-count — 8.7 ms/step at the old ``2*res`` default vs 4.1 ms
    at 64 — so probe count is the direct knob on occ-grid overhead.

    ``march_res`` (``OCC_MARCH_RES``): TPU-shaped probe lookup. The (B, S)
    probe gather from the R^3 table is the one hot-path gather the repo's
    no-gathers invariant still tolerated; with ``march_res=M`` set, the
    dilated grid is max-pooled to M^3 (requires R % M == 0), BOOLEANIZED,
    and each probe reads it through a one-hot equality MATMUL over the M^3
    columns — MXU work instead of serialized addressing, the same
    compare+matmul move as the hat-basis field lookup. Max-pooled occupancy
    is a SUPERSET of the fine grid's (any occupied fine cell occupies its
    coarse cell), so every bound this march produces contains the bound the
    full-res gather would produce: pooling can only weaken the tightening,
    never exclude a surface — margins and probe counts derived for the fine
    grid stay valid unchanged. (Booleanize BEFORE the matmul: never-probed
    cells hold inf, and IEEE ``0 * inf = nan`` would poison a one-hot dot
    against the raw table.)
    """
    res = grid.density.shape[0]
    if n_steps is None:
        n_steps = max(64, res)
    frac = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
    if lindisp:
        # disparity-spaced probes (matches LINDISP sampling; under
        # CONTRACT this is what keeps contracted-radial probe spacing
        # uniform — see derive_march_steps_contracted). Needs near > 0,
        # the same precondition LINDISP itself carries.
        ts = 1.0 / (1.0 / near[:, None]
                    + (1.0 / far - 1.0 / near)[:, None] * frac[None, :])
    else:
        ts = near[:, None] + (far - near)[:, None] * frac[None, :]  # (B, S)
    pts = origins[:, None, :] + ts[..., None] * dirs[:, None, :]    # (B, S, 3)
    if contract:
        # the grid's cells live in the contracted radius-2 ball: warp the
        # probe positions exactly like the field wrapper warps its inputs
        from tinynerf.core.contract import contract_mip360
        pts = contract_mip360(pts)

    if march_res is not None and march_res != res:
        if res % march_res != 0:
            raise ValueError(f"OCC_MARCH_RES {march_res} must divide the "
                             f"grid resolution {res}")
        f = res // march_res
        lookup_grid = jax.lax.reduce_window(
            grid.density, -jnp.inf, jax.lax.max, (f, f, f), (f, f, f),
            "VALID")
        lres = march_res
    else:
        lookup_grid = grid.density
        lres = res

    idx = jnp.floor((pts / grid.half_extent * 0.5 + 0.5) * lres).astype(
        jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < lres), axis=-1)
    idx = jnp.clip(idx, 0, lres - 1)
    flat = (idx[..., 0] * lres + idx[..., 1]) * lres + idx[..., 2]
    if march_res is not None:
        # one-hot equality matmul over the M^3 boolean table (see docstring)
        occ_bin = (lookup_grid.reshape(-1) > grid.threshold).astype(
            jnp.bfloat16)
        onehot = (flat[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (*flat.shape, lres ** 3), flat.ndim)).astype(
            jnp.bfloat16)
        occ = jnp.matmul(onehot, occ_bin[:, None],
                         precision=jax.lax.Precision.HIGHEST)[..., 0] > 0.5
    else:
        occ = lookup_grid.reshape(-1)[flat] > grid.threshold
    occ = occ & inside                                              # (B, S)

    # margin: at least one cell diagonal, so surfaces sitting right at an
    # occupied cell's boundary stay inside the tightened interval even when
    # probe spacing is finer than the cell size
    cell_diag = 2.0 * grid.half_extent / res * jnp.sqrt(3.0)
    big = jnp.float32(3.4e38)
    if lindisp:
        # probe spacing varies along a disparity march: margin each
        # occupied probe by its LOCAL spacing (one-sided diffs), with the
        # cell diagonal as the floor only where contraction is off (under
        # contract the world-space cell size is position-dependent and the
        # local spacing is the honest bound)
        dt = jnp.diff(ts, axis=1)
        dt_left = jnp.concatenate([dt[:, :1], dt], axis=1)
        dt_right = jnp.concatenate([dt, dt[:, -1:]], axis=1)
        if not contract:
            dt_left = jnp.maximum(dt_left, cell_diag)
            dt_right = jnp.maximum(dt_right, cell_diag)
        t_enter = jnp.min(jnp.where(occ, ts - dt_left, big), axis=1)
        t_exit = jnp.max(jnp.where(occ, ts + dt_right, -big), axis=1)
    else:
        step = jnp.maximum((far - near) / n_steps, cell_diag)
        t_enter = jnp.min(jnp.where(occ, ts, big), axis=1) - step
        t_exit = jnp.max(jnp.where(occ, ts, -big), axis=1) + step
    hit = jnp.any(occ, axis=1)
    new_near = jnp.where(hit, jnp.maximum(t_enter, near), far - 1e-3)
    new_far = jnp.where(hit, jnp.minimum(t_exit, far), far)
    return (jax.lax.stop_gradient(new_near), jax.lax.stop_gradient(new_far))
