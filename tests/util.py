"""Synthetic on-disk scene fixtures (no external datasets needed, SURVEY §4)."""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


def _look_at_pose(theta: float, radius: float = 4.0) -> np.ndarray:
    """A simple c2w on a circle in the xz-plane looking at the origin,
    [right, up, back] convention."""
    cam_pos = np.array([radius * np.sin(theta), 0.0, radius * np.cos(theta)])
    back = cam_pos / np.linalg.norm(cam_pos)          # away from origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, back)
    right /= np.linalg.norm(right)
    up2 = np.cross(back, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, back, cam_pos
    return c2w


def _toy_image(rng: np.random.Generator, hw: int, with_alpha: bool) -> Image.Image:
    """A smooth random RGB(A) image — enough structure to overfit."""
    base = rng.uniform(0.2, 0.8, size=(4, 4, 3))
    img = np.kron(base, np.ones((hw // 4, hw // 4, 1)))[:hw, :hw]
    arr = (img * 255).astype(np.uint8)
    if with_alpha:
        alpha = np.full((hw, hw, 1), 255, np.uint8)
        alpha[: hw // 2] = 128  # test white-background compositing
        arr = np.concatenate([arr, alpha], axis=-1)
        return Image.fromarray(arr, "RGBA")
    return Image.fromarray(arr, "RGB")


def make_sync_scene(root: str, n_pics: int = 3, hw: int = 12,
                    modes=("train", "val", "test")) -> None:
    rng = np.random.default_rng(0)
    for mode in modes:
        frames = []
        img_dir = os.path.join(root, mode)
        os.makedirs(img_dir, exist_ok=True)
        for i in range(n_pics):
            img = _toy_image(rng, hw, with_alpha=True)
            img.save(os.path.join(img_dir, f"r_{i}.png"))
            frames.append({
                "file_path": f"./{mode}/r_{i}",
                "transform_matrix": _look_at_pose(
                    2 * np.pi * i / n_pics).tolist(),
            })
        meta = {"camera_angle_x": 0.8, "frames": frames}
        with open(os.path.join(root, f"transforms_{mode}.json"), "w") as f:
            json.dump(meta, f)


def make_llff_scene(root: str, n_pics: int = 3, height: int = 8,
                    width: int = 10) -> None:
    rng = np.random.default_rng(1)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = np.zeros((n_pics, 17))
    for i in range(n_pics):
        img = _toy_image(rng, max(height, width), with_alpha=False)
        img = img.resize((width, height))
        img.save(os.path.join(img_dir, f"img_{i}.png"))
        c2w = _look_at_pose(0.3 * i)[:3, :4]
        # LLFF disk convention: [down, right, back] columns; the loader
        # converts via (col1, -col0, col2) — so store the inverse shuffle.
        llff_rot = np.stack([-c2w[:, 1], c2w[:, 0], c2w[:, 2]], axis=1)
        pose = np.concatenate(
            [np.concatenate([llff_rot, c2w[:, 3:4]], axis=1),
             np.array([[height], [width], [25.0]])], axis=1)
        rows[i] = np.concatenate([pose.flatten(), [1.0, 8.0]])
    np.save(os.path.join(root, "poses_bounds.npy"), rows)
