"""Unbounded-scene support: the mip-NeRF-360 scene contraction.

Opt-in capability (``CONTRACT = True``) the reference lacks entirely (its
renderer marches a fixed ``[near, far]`` box, ``nerf.py:288-295``): real
360-degree captures have background at unbounded depth, which no bounded
field — PE MLP or feature grid — can represent directly. Barron et al.
2022 (mip-NeRF 360, Eq. 10) warp world space into a bounded ball before
the field evaluates:

    contract(x) = x                          if ||x|| <= 1
                  (2 - 1/||x||) * x/||x||    otherwise

The whole unbounded exterior maps into the radius-2 shell; points at
infinity land on its surface. Combined with disparity-spaced samples
(``LINDISP``, core/sampling.coarse_ts) the march covers unbounded depth
with bounded, roughly contraction-uniform spacing — the standard 360
recipe, completing the stack with the already-present DIST_LOSS /
PROP_INTERLEVEL regularizers.

TPU-native placement: contraction composes at the FIELD level — a pure
elementwise warp of the sample points that XLA fuses into the field's
first op — so the renderer, resampler and compositor are untouched and
every field family (PE MLP, CP grid, proposal) inherits it through one
wrapper. The fused Pallas ray-kernels compute points *inside* the kernel,
so the wrapper deliberately exposes only the point interface
(``render._eval_field`` then takes its XLA path); contraction targets
quality-critical 360 scenes where that trade is right, and the grid
family — the natural partner, its table spanning the radius-2 ball via
``GRID_EXTENT = 2`` — runs pure XLA anyway.
"""

from __future__ import annotations

import jax.numpy as jnp


def contract_mip360(points: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) world points -> (..., 3) points in the radius-2 ball.

    Identity inside the unit ball, radially monotone outside, C^1 at the
    boundary. f32 math regardless of input dtype (the warp feeds grid
    coordinates / PE phases, both of which need sub-cell precision)."""
    pts = points.astype(jnp.float32)
    n2 = jnp.sum(pts * pts, axis=-1, keepdims=True)
    # max() keeps the sqrt grad finite at the origin (where the branch is
    # identity anyway — jnp.where still differentiates both sides)
    n = jnp.sqrt(jnp.maximum(n2, 1e-12))
    scale = jnp.where(n <= 1.0, 1.0, (2.0 - 1.0 / n) / n)
    return (pts * scale).astype(points.dtype)


def inv_contract_mip360(c: jnp.ndarray, max_norm: float = 1.99
                        ) -> jnp.ndarray:
    """Inverse of :func:`contract_mip360`: (..., 3) contracted-ball points
    -> world points. Identity inside the unit ball; outside,
    ``|x| = 1 / (2 - |c|)`` along the same ray. ``|c|`` clamps to
    ``max_norm`` (1.99 -> world radius 100): points at/past the radius-2
    boundary are "at infinity" and map to a far but finite probe radius.
    Used by the contracted occupancy grid, whose cells live in the
    contracted ball but whose field probes happen through the contracting
    field wrapper (world in -> contract -> field), so
    ``field(inv_contract(c))`` evaluates the raw field exactly at ``c``."""
    c = c.astype(jnp.float32)
    n = jnp.sqrt(jnp.maximum(jnp.sum(c * c, axis=-1, keepdims=True), 1e-12))
    n_cl = jnp.minimum(n, max_norm)
    scale = jnp.where(n <= 1.0, 1.0, 1.0 / ((2.0 - n_cl) * n_cl))
    return c * scale


def wrap_field_contract(field_fn):
    """Wrap a point-interface FieldFn so it evaluates at contracted points.

    The wrapper intentionally carries NO ``eval_rays`` / ``render_fused``
    attributes: the fused ray kernels expand ray->point inside the kernel
    where the warp cannot be injected, so contraction forces the point
    interface (see module docstring)."""
    def field(params, points, dirs):
        return field_fn(params, contract_mip360(points), dirs)

    return field
