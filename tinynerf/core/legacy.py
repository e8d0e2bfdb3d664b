"""Legacy-architecture field: render from the reference's SHIPPED checkpoints.

The reference repo ships seven trained artifacts (``checkpoint/0-6``,
543,052 params each) produced by an OLDER revision of its model class than
the code it ships (SURVEY.md §2.12): a 9-linear no-skip trunk with the color
head reading the trunk output directly — no ``point_info``/``dir_info``
bottleneck, no skip connection, ReLU (not abs) on sigma. They therefore load
into neither the reference's own current ``NeRFModel`` (``nerf.py:402-420``
crashes on them) nor our 593,924-param network.

This module re-implements that retired architecture as a plain-jnp field so
tinynerf can render the only reference-trained weights in existence:

- trunk: Linear(60->256) + ReLU, 7x (Linear(256->256) + ReLU),
  Linear(256->256) with NO trailing ReLU (the shipped pickle's outermost
  ``point_layer.1`` Sequential has no activation module after it);
- sigma head: Linear(256->1) + **Sigmoid** (the retired class bounded
  density to (0, 1) — unlike both abs (current reference, Q14) and the
  standard ReLU);
- color head: Linear(24+256 -> 3) + Sigmoid on ``concat(enc_dir, trunk)``
  (same dir-first concat order as the current reference, ``nerf.py:118``;
  verified bit-exact against the unpickled torch modules);
- positional encoding: identical to the current reference (fractional
  frequency bank, channel-major sin/cos — ``tinynerf/core/encoding.py``);
  the shipped ``Encoder`` state carries the same L_point=10 / L_dir=4.

``field_legacy`` plugs into ``render.render_rays(field_fn=...)`` unchanged,
so the full hierarchical renderer (and camera paths, video export) works on
shipped weights. Perf is irrelevant here (one-off artifact rendering), so
there is no Pallas variant.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tinynerf.core import encoding

TRUNK_DEPTH = 9          # 60->256, then 8x 256->256 (last without ReLU)
WIDTH = 256
N_PARAMS = 543_052       # shipped artifact size (VERDICT round-1 §missing-3)


def field_legacy(params: Dict[str, Any], points: jnp.ndarray,
                 dirs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(.., 3) points/dirs -> (color (.., 3), sigma (.., 1)) legacy network."""
    enc_pt = encoding.encode_points(points)
    enc_dir = encoding.encode_dirs(dirs)
    h = enc_pt
    for i in range(TRUNK_DEPTH - 1):
        w, b = params["trunk"][i]
        h = jax.nn.relu(h @ w + b)
    w, b = params["trunk"][TRUNK_DEPTH - 1]
    h = h @ w + b                      # outermost linear has no ReLU
    ws, bs = params["sigma"]
    sigma = jax.nn.sigmoid(h @ ws + bs)
    wc, bc = params["color"]
    color_in = jnp.concatenate([enc_dir, h], axis=-1)
    color = jax.nn.sigmoid(color_in @ wc + bc)
    return color, sigma


def n_params(params: Dict[str, Any]) -> int:
    return sum(int(np.prod(leaf.shape))
               for leaf in jax.tree_util.tree_leaves(params))


def load_shipped_checkpoint(path: str) -> Dict[str, Any]:
    """Unpickle a reference ``checkpoint/<N>`` artifact into a legacy pytree.

    The artifacts pickle the whole ``nn.Module`` object (not a state_dict),
    referencing classes ``NeRFModel``/``Encoder``/``Network`` in
    ``__main__`` — names that only existed in the retired training script.
    Stub module classes satisfy the unpickler (torch restores submodules and
    parameters through ``__dict__`` without calling ``__init__``).

    Trust note: the checkpoints come from the UNTRUSTED reference repo, so
    this does NOT run the full pickle VM (``weights_only=False`` would
    execute arbitrary code embedded in the archive). It uses torch's
    restricted weights-only unpickler with an explicit allowlist of the
    exact classes a genuine artifact references (verified by a pickletools
    scan of ``checkpoint/0-6``): the three ``__main__`` stubs plus
    ``Sequential``/``Linear``/``ReLU``/``Sigmoid``. Anything else in the
    stream — any callable, reduce hook, or os/system reference — raises.
    """
    import sys
    import torch
    import torch.nn as nn

    class NeRFModel(nn.Module):
        pass

    class Encoder(nn.Module):
        pass

    class Network(nn.Module):
        pass

    main = sys.modules["__main__"]
    saved = {}
    try:
        for cls in (NeRFModel, Encoder, Network):
            name = cls.__name__
            # the allowlist keys classes by __module__.__qualname__, which
            # must equal the name the pickle references (__main__.<name>)
            cls.__module__, cls.__qualname__ = "__main__", name
            saved[name] = getattr(main, name, None)
            setattr(main, name, cls)
        with torch.serialization.safe_globals(
                [NeRFModel, Encoder, Network, nn.Sequential, nn.Linear,
                 nn.ReLU, nn.Sigmoid]):
            model = torch.load(path, map_location="cpu", weights_only=True)
    finally:
        for name, old in saved.items():
            if old is None:
                try:
                    delattr(main, name)
                except AttributeError:
                    pass
            else:
                setattr(main, name, old)

    sd = model.state_dict()
    # state_dict order == execution order: the telescoped Sequential nesting
    # registers the innermost (first-executed) Linear first
    trunk_keys = [k for k in sd if k.startswith("network.point_layer")
                  and k.endswith("weight")]
    if len(trunk_keys) != TRUNK_DEPTH:
        raise ValueError(
            f"{path}: expected {TRUNK_DEPTH} trunk linears, found "
            f"{len(trunk_keys)} — not a shipped legacy checkpoint")

    def lin(prefix: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = jnp.asarray(sd[prefix + "weight"].numpy().T)  # torch (out,in)
        b = jnp.asarray(sd[prefix + "bias"].numpy())
        return w, b

    trunk: List[Tuple[jnp.ndarray, jnp.ndarray]] = [
        lin(k[: -len("weight")]) for k in trunk_keys]
    params = {
        "trunk": trunk,
        "sigma": lin("network.sigma_layer.0."),
        "color": lin("network.color_layer.0."),
    }
    if n_params(params) != N_PARAMS:
        raise ValueError(f"{path}: got {n_params(params)} params, "
                         f"expected {N_PARAMS}")
    return params
