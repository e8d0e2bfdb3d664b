"""Proposal-style coarse field: a narrow MLP for the coarse pass only.

Opt-in FLOP reduction (``PROPOSAL = True``); defaults stay reference-
faithful. The reference shares ONE 593,924-param network between the coarse
and fine passes (``nerf.py:172-173``, SURVEY.md Q14). Both Pallas kernels sit
at 86-100% of the measured MXU roofline, so the only remaining single-chip
lever is doing fewer FLOPs: the coarse pass exists solely to (a) place the
fine samples via the inverse-CDF resampler and (b) carry the auxiliary
coarse loss — both jobs a much smaller field does adequately, which is the
proposal-network idea of mip-NeRF 360 (cf. PAPERS.md) mapped onto this
pipeline.

Design:
- the coarse pass (64 of 192 samples = 1/3 of the field FLOPs) evaluates
  this ~9x-cheaper network; the fine pass keeps the full reference network;
- the rest of the pipeline is UNCHANGED: the merged 192-sample composite
  still integrates the coarse samples (their sigma/rgb now from this net),
  the resampler still leaks fine-loss gradients into coarse sigma (Q8), and
  the coarse loss trains this network exactly like the reference's coarse
  head loss;
- architecture: ``depth`` x ``width`` ReLU trunk (no skip — at depth 4 the
  skip re-concat buys nothing), sigma = abs(Linear(width, 1)) matching the
  reference's abs activation, color = sigmoid(Linear(width + 24, 3)) on
  concat(dir_enc, trunk) — a single narrow view-dependent head.
  width=128 is one MXU tile, so the narrow matmuls still fill the array.

At the defaults (width 128, depth 4): ~57k MACs/point vs the main
network's ~508k — 8.9x fewer coarse FLOPs, ~1.4x end-to-end step ceiling.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from tinynerf.core import encoding
from tinynerf.core.encoding import DIR_ENC_DIM, L_POINT, POINT_ENC_DIM
from tinynerf.core.mlp import _linear, _linear_init

WIDTH = 128
DEPTH = 4

Params = Dict[str, Any]


def layer_dims(width: int = WIDTH, depth: int = DEPTH,
               point_dim: int = POINT_ENC_DIM, dir_dim: int = DIR_ENC_DIM,
               ) -> List[Tuple[str, int, int]]:
    dims: List[Tuple[str, int, int]] = [("trunk_0", point_dim, width)]
    dims += [(f"trunk_{i}", width, width) for i in range(1, depth)]
    dims += [("sigma", width, 1), ("color", width + dir_dim, 3)]
    return dims


def init_proposal(key: jax.Array, width: int = WIDTH, depth: int = DEPTH,
                  enc_l: int = L_POINT) -> Params:
    dims = layer_dims(width, depth, point_dim=3 * 2 * enc_l)
    keys = jax.random.split(key, len(dims))
    return {name: _linear_init(k, fi, fo)
            for k, (name, fi, fo) in zip(keys, dims)}


def apply_proposal(params: Params, point_enc: jnp.ndarray,
                   dir_enc: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(.., 60) point_enc, (.., 24) dir_enc -> (color (.., 3), sigma (.., 1))."""
    h = point_enc
    i = 0
    while f"trunk_{i}" in params:
        h = jax.nn.relu(_linear(params[f"trunk_{i}"], h))
        i += 1
    sigma = jnp.abs(_linear(params["sigma"], h))  # abs like the reference Q14
    color = jax.nn.sigmoid(
        _linear(params["color"], jnp.concatenate([dir_enc, h], axis=-1)))
    return color, sigma


def field_proposal(params: Params, points: jnp.ndarray, dirs: jnp.ndarray,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in FieldFn (same signature as ``render.field_jnp``)."""
    return apply_proposal(params, encoding.encode_points(points),
                          encoding.encode_dirs(dirs))


def make_field_proposal(enc_l: int = L_POINT, compute_dtype=None):
    """FieldFn factory with a configurable point-encoding bank width.

    ``PROPOSAL_ENC_L < 10`` drops the top PE frequency bands from the
    proposal field only: its job is sample PLACEMENT (the rendered image
    integrates just the fine samples), so it does not need the full
    fractional Q3 bank — and the narrow net's per-row cost is dominated by
    the fixed PE transcendentals (see kernels/proposal_kernel.py STATUS),
    so fewer bands cut exactly the term that bounds it. The dir encoding
    stays at L=4 (24 dims). ``compute_dtype=jnp.bfloat16`` casts the
    ENCODINGS (f32-computed, like train.make_field_fn's bf16 path)."""
    freqs = encoding.freq_bank(enc_l)

    def field(params: Params, points: jnp.ndarray, dirs: jnp.ndarray,
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pe = encoding.positional_encode(points, freqs)
        de = encoding.encode_dirs(dirs)
        if compute_dtype is not None:
            pe = pe.astype(compute_dtype)
            de = de.astype(compute_dtype)
        color, sigma = apply_proposal(params, pe, de)
        if compute_dtype is not None:
            color = color.astype(jnp.float32)
            sigma = sigma.astype(jnp.float32)
        return color, sigma

    return field
