"""Checkpoint / resume: flat-npz parameter-tree checkpoints.

Replaces the reference's whole-module ``torch.save(model)`` pickle
(``nerf.py:491``, SURVEY.md §2.12) with architecture-independent npz archives
holding the param pytree, Adam state and the iteration counter. File naming
keeps the reference convention ``<start_time>_<iter>`` so resume-latest
(glob + parse max iter, ``nerf.py:404-415``) works identically.

Also provides :func:`import_torch_state_dict` so weights trained with the
reference PyTorch code (current architecture) can be loaded directly.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

_SEP = "::"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        flat[prefix.rstrip(_SEP)] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_checkpoint(path_dir: str, start_time: str, iteration: int,
                    params: Any, opt_state=None, key=None, occ=None) -> str:
    """Write ``<ckpt_path>/<start_time>_<iter>.npz``; returns the path."""
    os.makedirs(path_dir, exist_ok=True)
    path = os.path.join(path_dir, f"{start_time}_{iteration}.npz")
    blobs = {"iteration": np.asarray(iteration, np.int64)}
    if key is not None:
        blobs["prng_key"] = np.asarray(key)  # exact-resume sample stream
    for k, v in _flatten(params).items():
        blobs[f"params{_SEP}{k}"] = v
    if opt_state is not None:
        blobs["adam_count"] = np.asarray(opt_state.count)
        for k, v in _flatten(opt_state.mu).items():
            blobs[f"mu{_SEP}{k}"] = v
        for k, v in _flatten(opt_state.nu).items():
            blobs[f"nu{_SEP}{k}"] = v
    if occ is not None:
        # the occupancy grid is TRAINING state: the weights co-adapt to its
        # tightened sample distribution, so rendering from a resumed
        # checkpoint with a fresh (all-occupied) grid drops PSNR hard
        blobs[f"occ{_SEP}raw"] = np.asarray(occ.raw)
        blobs[f"occ{_SEP}density"] = np.asarray(occ.density)
        blobs[f"occ{_SEP}half_extent"] = np.asarray(occ.half_extent)
        blobs[f"occ{_SEP}threshold"] = np.asarray(occ.threshold)
    np.savez(path, **blobs)
    return path


def load_checkpoint(path: str) -> Tuple[int, Any, Optional[Any]]:
    """Returns (iteration, params, adam_state_or_None). Use
    :func:`load_checkpoint_full` to also recover the PRNG key + occ grid."""
    return load_checkpoint_full(path)[:3]


def load_checkpoint_full(path: str):
    """Returns (iteration, params, adam_state_or_None, prng_key_or_None,
    occ_grid_or_None)."""
    from tinynerf.optim import AdamState

    with np.load(path) as archive:
        iteration = int(archive["iteration"])
        prng_key = (jnp.asarray(archive["prng_key"])
                    if "prng_key" in archive.files else None)
        params = _unflatten(
            {k[len(f"params{_SEP}"):]: archive[k]
             for k in archive.files if k.startswith(f"params{_SEP}")})
        opt_state = None
        if "adam_count" in archive.files:
            mu = _unflatten({k[len(f"mu{_SEP}"):]: archive[k]
                             for k in archive.files if k.startswith(f"mu{_SEP}")})
            nu = _unflatten({k[len(f"nu{_SEP}"):]: archive[k]
                             for k in archive.files if k.startswith(f"nu{_SEP}")})
            opt_state = AdamState(count=jnp.asarray(archive["adam_count"]),
                                  mu=mu, nu=nu)
        occ = None
        if f"occ{_SEP}raw" in archive.files:
            from tinynerf.core.occupancy import OccGrid
            occ = OccGrid(
                raw=jnp.asarray(archive[f"occ{_SEP}raw"]),
                density=jnp.asarray(archive[f"occ{_SEP}density"]),
                half_extent=jnp.asarray(archive[f"occ{_SEP}half_extent"]),
                threshold=jnp.asarray(archive[f"occ{_SEP}threshold"]))
    return iteration, params, opt_state, prng_key, occ


_ITER_RE = re.compile(r"_(\d+)\.npz$")


def find_latest(ckpt_dir: str) -> Optional[str]:
    """Latest-by-iteration checkpoint path, or None (reference resume scan,
    ``nerf.py:404-415``)."""
    best_iter, best_path = -1, None
    for path in glob.glob(os.path.join(ckpt_dir, "*.npz")):
        m = _ITER_RE.search(path)
        if m and int(m.group(1)) > best_iter:
            best_iter, best_path = int(m.group(1)), path
    return best_path


def import_torch_state_dict(state_dict: Dict[str, Any]) -> Any:
    """Map a reference ``Network`` state_dict (current architecture,
    ``nerf.py:76-99``) onto our param pytree. Torch ``Linear`` stores
    ``(out, in)`` weights; ours are ``(in, out)``."""
    def get(name):
        w = np.asarray(state_dict[f"{name}.weight"], dtype=np.float32).T
        b = np.asarray(state_dict[f"{name}.bias"], dtype=np.float32)
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    params = {}
    for i in range(8):
        params[f"trunk_{i}"] = get(f"point_layer.{i}.0")
    params["sigma"] = get("sigma_layer.0")
    params["point_info"] = get("point_info")
    params["dir_info"] = get("dir_info.0")
    params["color"] = get("color_layer.0")
    return params


def export_torch_state_dict(params: Any) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_torch_state_dict`: map our MLP param pytree
    onto the reference ``Network`` state_dict names (``nerf.py:76-99``),
    weights transposed back to torch's ``(out, in)`` layout. Only the
    reference-architecture MLP family exports (the grid fields have no
    reference counterpart). Values are numpy; the caller tensorizes
    (tools/export_torch_ckpt.py writes a reference-resumable ``.pkl``)."""
    if "net" in params and isinstance(params["net"], dict):
        params = params["net"]  # PROPOSAL tree: the fine net is the model
    if "trunk_0" not in params:
        raise ValueError(
            "only the MLP family maps onto the reference Network "
            "(FINE_FIELD=grid checkpoints have no torch counterpart)")

    def put(name: str, leaf: Dict[str, Any]) -> Dict[str, np.ndarray]:
        return {f"{name}.weight": np.asarray(leaf["w"], np.float32).T.copy(),
                f"{name}.bias": np.asarray(leaf["b"], np.float32).copy()}

    sd: Dict[str, np.ndarray] = {}
    for i in range(8):
        sd.update(put(f"point_layer.{i}.0", params[f"trunk_{i}"]))
    sd.update(put("sigma_layer.0", params["sigma"]))
    sd.update(put("point_info", params["point_info"]))
    sd.update(put("dir_info.0", params["dir_info"]))
    sd.update(put("color_layer.0", params["color"]))
    return sd
