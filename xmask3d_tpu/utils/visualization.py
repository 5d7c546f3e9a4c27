"""Visualization: colored point-cloud PLY dumps + label palettes.

Capability parity with the reference's PLY visualization
(run/infer.py:268-335 save_colored_point_cloud, util/util.py palettes).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# 20-class ScanNet-style palette (RGB 0-255)
SCANNET_PALETTE = np.array(
    [
        (174, 199, 232), (152, 223, 138), (31, 119, 180), (255, 187, 120),
        (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40),
        (197, 176, 213), (148, 103, 189), (196, 156, 148), (23, 190, 207),
        (247, 182, 210), (219, 219, 141), (255, 127, 14), (158, 218, 229),
        (44, 160, 44), (112, 128, 144), (227, 119, 194), (82, 84, 163),
    ],
    dtype=np.uint8,
)


def write_ply(
    path: str, coords: np.ndarray, colors: np.ndarray
) -> None:
    """ASCII PLY with xyz + rgb."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    n = len(coords)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for (x, y, z), (r, g, b) in zip(coords, colors):
            f.write(f"{x:.4f} {y:.4f} {z:.4f} {int(r)} {int(g)} {int(b)}\n")


def save_colored_point_cloud(
    path: str,
    coords: np.ndarray,
    labels: np.ndarray,
    palette: Optional[np.ndarray] = None,
    ignore: Sequence[int] = (255,),
) -> None:
    """Dump a per-point-labeled cloud as PLY (infer.py:268-335). Ignored
    labels render gray."""
    palette = SCANNET_PALETTE if palette is None else palette
    colors = np.full((len(labels), 3), 128, np.uint8)
    ok = ~np.isin(labels, list(ignore)) & (labels < len(palette))
    colors[ok] = palette[labels[ok] % len(palette)]
    write_ply(path, coords, colors)
