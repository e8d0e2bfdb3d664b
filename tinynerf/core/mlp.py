"""The radiance-field MLP: functional init/apply over a parameter pytree.

Architecture matches the reference ``Network`` (``nerf.py:76-124``) exactly
(SURVEY.md §2.6): an 8-layer, width-256 trunk with an input re-concat skip at
layer 4 (``Linear(316,256)``), a sigma head ``Linear(256,1)`` with **abs**
activation (``nerf.py:94,74`` — not ReLU/softplus), an unactivated
``point_info = Linear(256,256)`` feature head, a view branch
``Linear(280,128)+ReLU`` over ``concat(dir_enc, point_info)`` (dir first,
``nerf.py:118``), and ``color = Linear(128,3)+Sigmoid``. One single network is
shared by the coarse and fine passes (``nerf.py:172-173``).

Total parameters: 593,924 (fp32 ≈ 2.3 MB — fits entirely in TPU VMEM, which is
what the fused Pallas kernel in ``tinynerf/kernels`` exploits).

Initialization reproduces PyTorch's ``nn.Linear`` default (uniform
±1/sqrt(fan_in) for both weight and bias) so training dynamics match the
reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from tinynerf.core.encoding import DIR_ENC_DIM, POINT_ENC_DIM

DEPTH = 8
WIDTH = 256
SKIP_LAYERS = (4,)

Params = Dict[str, Any]


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    """PyTorch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(float(fan_in))
    # stored as (fan_in, fan_out) for row-major x @ W
    w = jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def layer_dims(point_dim: int = POINT_ENC_DIM, dir_dim: int = DIR_ENC_DIM,
               depth: int = DEPTH, width: int = WIDTH,
               skip_layers: Tuple[int, ...] = SKIP_LAYERS) -> List[Tuple[str, int, int]]:
    """(name, fan_in, fan_out) for every linear layer, in forward order."""
    dims: List[Tuple[str, int, int]] = [("trunk_0", point_dim, width)]
    for i in range(1, depth):
        fan_in = width + point_dim if i in skip_layers else width
        dims.append((f"trunk_{i}", fan_in, width))
    dims += [
        ("sigma", width, 1),
        ("point_info", width, width),
        ("dir_info", width + dir_dim, width // 2),
        ("color", width // 2, 3),
    ]
    return dims


def init_network(key: jax.Array, point_dim: int = POINT_ENC_DIM,
                 dir_dim: int = DIR_ENC_DIM, depth: int = DEPTH,
                 width: int = WIDTH,
                 skip_layers: Tuple[int, ...] = SKIP_LAYERS) -> Params:
    dims = layer_dims(point_dim, dir_dim, depth, width, skip_layers)
    keys = jax.random.split(key, len(dims))
    return {name: _linear_init(k, fi, fo) for k, (name, fi, fo) in zip(keys, dims)}


def num_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def _linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    # HIGHEST: XLA's TPU default multiplies f32 at bf16 precision, which is
    # enough gradient noise to destabilize high-LR training (the Pallas fast
    # path requests full precision internally for the same reason). For bf16
    # inputs (precision="bf16" configs) HIGHEST is the same single MXU pass.
    return (jnp.matmul(x, p["w"].astype(x.dtype),
                       precision=jax.lax.Precision.HIGHEST)
            + p["b"].astype(x.dtype))


def apply_network(params: Params, point_enc: jnp.ndarray, dir_enc: jnp.ndarray,
                  depth: int = DEPTH,
                  skip_layers: Tuple[int, ...] = SKIP_LAYERS,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass. ``point_enc (..., 60)``, ``dir_enc (..., 24)`` ->
    ``(color (..., 3), sigma (..., 1))``. Pure jnp; the Pallas fused kernel in
    ``tinynerf/kernels/mlp_kernel.py`` is the drop-in fast path.
    """
    h = point_enc
    for i in range(depth):
        if i in skip_layers:
            h = jnp.concatenate([h, point_enc], axis=-1)  # hidden first (nerf.py:109)
        h = jax.nn.relu(_linear(params[f"trunk_{i}"], h))
    sigma = jnp.abs(_linear(params["sigma"], h))
    point_info = _linear(params["point_info"], h)  # no activation (nerf.py:96,117)
    color_in = jnp.concatenate([dir_enc, point_info], axis=-1)  # dir first (nerf.py:118)
    h_dir = jax.nn.relu(_linear(params["dir_info"], color_in))
    color = jax.nn.sigmoid(_linear(params["color"], h_dir))
    return color, sigma
