"""Render frames from the reference's SHIPPED legacy checkpoints.

The reference ships ``checkpoint/0-6`` (543,052-param retired architecture)
that its own current code cannot load (``nerf.py:402-420`` crashes on them).
tinynerf renders them through the standard hierarchical pipeline via
``tinynerf.core.legacy``:

    python tools/render_shipped_ckpt.py --ckpt /root/reference/checkpoint/6 \
        --out /tmp/legacy_render --hw 200 --views 4

Content note: all seven shipped artifacts encode a collapsed (saturated
white-fog) field — see tests/test_legacy.py — so expect uniform frames;
the point of this tool is artifact compatibility, not pretty pictures.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def look_at(position: np.ndarray) -> np.ndarray:
    back = position / np.linalg.norm(position)
    up_hint = np.array([0.0, 1.0, 0.0])
    right = np.cross(up_hint, back)
    right /= np.linalg.norm(right)
    up = np.cross(back, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, back, position
    return c2w


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/reference/checkpoint/6")
    ap.add_argument("--out", default="./legacy_render/")
    ap.add_argument("--hw", type=int, default=200)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--radius", type=float, default=4.03)
    ap.add_argument("--coarse", type=int, default=16,
                    help="the retired model trained with num_coarse=16")
    ap.add_argument("--fine", type=int, default=32)
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from tinynerf import eval as evallib
    from tinynerf.config import Config
    from tinynerf.core import legacy
    from tinynerf.core.rays import make_k_inv

    params = legacy.load_shipped_checkpoint(args.ckpt)
    hw = args.hw
    focal = 0.5 * hw / np.tan(0.6911112070083618 / 2)  # blender lego fov
    cfg = Config(n_coarse=args.coarse, n_fine=args.fine, use_pallas=False,
                 render_chunk=min(4096, hw * hw), white_bkgd=True)
    k_inv = make_k_inv(hw, hw, focal)
    frame_fn = evallib.make_frame_fn(cfg, k_inv, hw, hw,
                                     field_fn=legacy.field_legacy)

    os.makedirs(args.out, exist_ok=True)
    hwf = np.array([[hw], [hw], [focal]])
    for i in range(args.views):
        theta = 2 * np.pi * i / args.views
        pos = np.array([np.sin(theta) * 0.92, 0.4, np.cos(theta) * 0.92])
        pos = pos / np.linalg.norm(pos) * args.radius
        c2w = look_at(pos)
        p17 = np.concatenate(
            [np.concatenate([c2w[:3, :4], hwf], 1).flatten(),
             [2.0, 6.0]]).astype(np.float32)
        img = np.asarray(frame_fn(params, jnp.asarray(p17)))
        path = os.path.join(args.out, f"view_{i:03d}.png")
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
        print("wrote", path)


if __name__ == "__main__":
    main()
