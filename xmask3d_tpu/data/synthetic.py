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


def _room_surface_points(
    rng: np.random.RandomState, n: int, room=(4.0, 4.0, 2.5), res: float = 0.05
) -> np.ndarray:
    """Sample n points on the surfaces of a synthetic room (floor, walls, a
    few box-shaped furniture pieces), jittered-grid spaced at ~`res` so
    voxelization yields CONTIGUOUS surface patches — the occupancy structure
    of real ScanNet scans (dense 2D manifolds in 3D), not volumetric noise.
    Kernel-map hit rates and per-neighborhood voxel density downstream match
    the production workload because of this."""
    rx, ry, rz = room
    # (origin, edge_u, edge_v) rectangles: floor + 4 walls
    rects = [
        ((0, 0, 0), (rx, 0, 0), (0, ry, 0)),
        ((0, 0, 0), (rx, 0, 0), (0, 0, rz)),
        ((0, 0, 0), (0, ry, 0), (0, 0, rz)),
        ((0, ry, 0), (rx, 0, 0), (0, 0, rz)),
        ((rx, 0, 0), (0, ry, 0), (0, 0, rz)),
    ]
    for _ in range(rng.randint(2, 5)):  # furniture boxes: top + 4 sides
        bx, by = rng.uniform(0.3, 1.2, size=2)
        bz = rng.uniform(0.3, 1.0)
        ox, oy = rng.uniform(0.2, rx - 1.5), rng.uniform(0.2, ry - 1.5)
        rects += [
            ((ox, oy, bz), (bx, 0, 0), (0, by, 0)),
            ((ox, oy, 0), (bx, 0, 0), (0, 0, bz)),
            ((ox, oy, 0), (0, by, 0), (0, 0, bz)),
            ((ox, oy + by, 0), (bx, 0, 0), (0, 0, bz)),
            ((ox + bx, oy, 0), (0, by, 0), (0, 0, bz)),
        ]
    areas = np.array(
        [np.linalg.norm(np.cross(u, v)) for _, u, v in rects], np.float64
    )
    counts = rng.multinomial(n, areas / areas.sum())
    pts = []
    for (o, u, v), c in zip(rects, counts):
        if c == 0:
            continue
        lu, lv = np.linalg.norm(u), np.linalg.norm(v)
        # jittered grid at ~res spacing, subsampled to the point budget
        gu = max(1, int(lu / res))
        gv = max(1, int(lv / res))
        iu = rng.randint(0, gu, size=c)
        iv = rng.randint(0, gv, size=c)
        fu = (iu + rng.rand(c)) / gu
        fv = (iv + rng.rand(c)) / gv
        pts.append(
            np.asarray(o)[None]
            + fu[:, None] * np.asarray(u)[None]
            + fv[:, None] * np.asarray(v)[None]
        )
    out = np.concatenate(pts, axis=0)
    return out[rng.permutation(len(out))][:n]


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
    pts = _room_surface_points(rng, n)
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


def synthetic_scene(
    caps: Capacities,
    seed: int = 0,
    num_points: int = 8000,
    num_views: int = 4,
    num_classes: int = 15,
    image_size=(64, 64),
    mask_shape=(24, 32),
    context_length: int = 16,
    vocab_size: int = 512,
) -> Dict:
    """A synthetic SCENE with consistent multi-view structure: one point
    cloud, several views whose visible subsets are contiguous spatial crops
    of it — the layout ScanNetSceneViews.scene produces (scannet.py:335-356).
    Used by the scene-reuse impact harness and tests."""
    rng = np.random.RandomState(seed)
    pts = _room_surface_points(rng, num_points)
    colors = rng.rand(num_points, 3) * 255
    labels = rng.randint(0, num_classes, size=num_points).astype(np.int64)

    views = []
    for _ in range(num_views):
        # contiguous crop: a random half-space band through the room
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        proj = pts @ d
        lo = np.quantile(proj, rng.uniform(0.0, 0.35))
        hi = np.quantile(proj, rng.uniform(0.6, 1.0))
        visible = (proj >= lo) & (proj <= hi)
        n_vis = int(visible.sum())
        if n_vis < 50:
            visible = np.ones(num_points, bool)
            n_vis = num_points
        idx = np.where(visible)[0]
        pv = pts[idx]
        cv = colors[idx]

        vox = Voxelizer(voxel_size=0.05)
        coords, feats, _, inds_rec = vox.voxelize(
            pv, cv, labels[idx]
        )
        coords = coords[: caps.max_voxels]

        h, w = image_size
        img = (rng.rand(h, w, 3) * 255).astype(np.float32)
        label_2d = np.full((h, w), num_classes, np.int64)
        for _ in range(rng.randint(2, 5)):
            cls = rng.randint(0, num_classes)
            y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
            label_2d[y0 : y0 + h // 3, x0 : x0 + w // 3] = cls
        binary_2d = (label_2d[:: max(1, h // 128), :: max(1, w // 128)]
                     [:128, :128] < num_classes).astype(np.float32)

        tok = build_tokenizer(vocab_size=vocab_size, context_length=context_length)
        sample = ViewSample(
            voxel_coords=coords,
            voxel_feats=(feats[: caps.max_voxels] / 127.5 - 1.0).astype(np.float32),
            inds_reconstruct=np.clip(inds_rec, 0, caps.max_voxels - 1),
            labels_3d=labels[idx],
            binary_label_3d=rng.randint(0, 2, size=n_vis).astype(np.float32),
            x_label=rng.randint(0, mask_shape[0], size=n_vis),
            y_label=rng.randint(0, mask_shape[1], size=n_vis),
            img=img,
            label_2d=label_2d,
            binary_label_2d=binary_2d,
            caption_tokens=tok(["a synthetic room"])[0],
        )
        views.append({"sample": sample, "visible": visible})

    return {
        "name": f"synthetic_{seed}",
        "coords": pts,
        "colors": colors,
        "labels": labels,
        "views": views,
    }


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
