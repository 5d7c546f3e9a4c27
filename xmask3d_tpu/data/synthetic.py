"""Synthetic ScanNet-like scenes for tests and benchmarks.

Generates random room-like point clouds with planar structures, poses,
depths, captions and 2D labels, then runs them through the real host
pipeline (voxelizer + projection + batcher) so downstream code sees exactly
the production batch layout. No ScanNet data is redistributed here.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from xmask3d_tpu.data.batching import Capacities, ViewSample, collate_views
from xmask3d_tpu.data.tokenizer import build_tokenizer
from xmask3d_tpu.data.voxelizer import Voxelizer


def synthetic_view_sample(
    rng: np.random.RandomState,
    caps: Capacities,
    num_points: int = 2000,
    num_classes: int = 15,
    image_size=(512, 512),
    mask_shape=(240, 320),
    context_length: int = 77,
    vocab_size: int = 49408,
) -> ViewSample:
    n = num_points
    pts = rng.rand(n, 3) * np.array([4.0, 4.0, 2.5])
    colors = rng.rand(n, 3) * 255

    vox = Voxelizer(voxel_size=0.05)
    coords, feats, labels, inds_rec = vox.voxelize(
        pts, colors, rng.randint(0, num_classes, size=n)
    )
    coords = coords[: caps.max_voxels]

    labels_3d = rng.randint(0, num_classes + 1, size=n)
    binary = rng.randint(0, 2, size=n).astype(np.float32)
    x_label = rng.randint(10, mask_shape[0] - 10, size=n)
    y_label = rng.randint(10, mask_shape[1] - 10, size=n)

    h, w = image_size
    img = (rng.rand(h, w, 3) * 255).astype(np.float32)
    # blocky 2D labels: a few rectangles of distinct classes
    label_2d = np.full((h, w), num_classes, np.int64)
    for _ in range(rng.randint(2, 6)):
        cls = rng.randint(0, num_classes)
        y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
        hh = rng.randint(h // 4, max(h // 2, h // 4 + 1))
        ww = rng.randint(w // 4, max(w // 2, w // 4 + 1))
        label_2d[y0 : y0 + hh, x0 : x0 + ww] = cls
    binary_label_2d = (label_2d[::4, ::4][:128, :128] < num_classes).astype(np.float32)

    tok = build_tokenizer(vocab_size=vocab_size, context_length=context_length)
    caption = tok(["a room with chairs and a table"])[0]

    return ViewSample(
        voxel_coords=coords,
        voxel_feats=(feats[: caps.max_voxels] / 127.5 - 1.0).astype(np.float32),
        inds_reconstruct=np.clip(inds_rec, 0, caps.max_voxels - 1),
        labels_3d=labels_3d,
        binary_label_3d=binary,
        x_label=x_label,
        y_label=y_label,
        img=img,
        label_2d=label_2d,
        binary_label_2d=binary_label_2d,
        caption_tokens=caption,
    )


def synthetic_batch(
    batch_size: int,
    caps: Capacities,
    seed: int = 0,
    num_points: int = 2000,
    num_classes: int = 15,
    image_size=(512, 512),
    mask_shape=(240, 320),
    context_length: int = 77,
    vocab_size: int = 49408,
    device_hierarchy: bool = False,
) -> Dict:
    rng = np.random.RandomState(seed)
    samples = [
        synthetic_view_sample(
            rng, caps, num_points, num_classes, image_size, mask_shape,
            context_length, vocab_size,
        )
        for _ in range(batch_size)
    ]
    return collate_views(
        samples, caps, num_base=num_classes, device_hierarchy=device_hierarchy
    )
