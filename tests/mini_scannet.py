"""Miniature on-disk ScanNet-layout dataset builder, shared by the loader
tests and the real-data infer-CLI integration test."""

import json

import numpy as np

LABEL_2D = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
BASE = [0, 1, 2, 3, 4, 6, 7, 8, 10, 11, 13, 14, 15, 17, 18]
NOVEL = [5, 9, 12, 16]


def build_mini_scannet(root, n_views: int = 1, seed: int = 0,
                       scene: str = "scene0000_00", n_points: int = 4000):
    """One scene with n_views accepted views under `root` (pathlib.Path)."""
    import imageio.v2 as imageio
    import torch

    rng = np.random.RandomState(seed)
    pts = np.zeros((n_points, 3))
    pts[:, 0] = rng.uniform(-1.5, 1.5, n_points)
    pts[:, 1] = rng.uniform(-1.0, 1.0, n_points)
    pts[:, 2] = rng.uniform(1.0, 3.0, n_points)  # camera looks along +z
    colors = rng.uniform(-1, 1, (n_points, 3))
    labels = rng.randint(0, 19, n_points).astype(np.float64)
    for split in ("train", "val"):
        d3 = root / "scannet_3d" / split
        d3.mkdir(parents=True, exist_ok=True)
        torch.save((pts, colors, labels), d3 / f"{scene}_vh_clean_2.pth")

    d2 = root / "scannet_2d" / scene
    for sub in ["color", "depth", "pose", "label"]:
        (d2 / sub).mkdir(parents=True, exist_ok=True)
    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    lbl = rng.choice(LABEL_2D, size=(480, 640)).astype(np.uint8)
    captions = {}
    for i in range(n_views):
        np.savetxt(d2 / "pose" / f"{i}.txt", np.eye(4))
        imageio.imwrite(d2 / "color" / f"{i}.jpg", img)
        imageio.imwrite(
            d2 / "depth" / f"{i}.png", np.full((240, 320), 2000, np.uint16)
        )
        imageio.imwrite(d2 / "label" / f"{i}.png", lbl)
        captions[str(i)] = f"a synthetic room view {i}"
    (root / "caption.json").write_text(json.dumps({scene: captions}))
    return root
