"""Static-shape batch assembly (the TPU replacement for torch collation).

The reference's collation (dataset/data_loader.py:319-357) concatenates
variable-length per-scene tensors with batch-index columns; every downstream
consumer then does boolean indexing per scene. On TPU everything must be
fixed-shape: this module pads each per-view sample to configured capacities
and emits a batch pytree with validity masks. All per-scene loops downstream
become masked batched ops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from xmask3d_tpu.ops.sparse_conv import SparseHierarchy, build_hierarchy, stack_hierarchies


@dataclass
class Capacities:
    """Static capacities for one view-sample."""

    max_points: int = 65536  # visible points per view (< 65000 by acceptance)
    max_voxels: int = 49152  # stride-1 voxels
    max_targets: int = 24  # GT masks per view
    num_levels: int = 5
    level_divisors: Sequence[int] = (1, 2, 4, 8, 16)

    def level_caps(self):
        return tuple(
            max(16, self.max_voxels // d) for d in self.level_divisors
        )


def _pad1(x: np.ndarray, n: int, fill=0):
    out = np.full((n,) + x.shape[1:], fill, dtype=x.dtype)
    m = min(len(x), n)
    out[:m] = x[:m]
    return out


@dataclass
class ViewSample:
    """One (scene-view) training/eval sample before padding. All numpy."""

    voxel_coords: np.ndarray  # (V, 3) int32
    voxel_feats: np.ndarray  # (V, 3) float32 in [-1, 1]
    inds_reconstruct: np.ndarray  # (P,) int64 point -> voxel row
    labels_3d: np.ndarray  # (P,) int64
    binary_label_3d: np.ndarray  # (P,) float32
    x_label: np.ndarray  # (P,) int64, row in mask space (240)
    y_label: np.ndarray  # (P,) int64, col in mask space (320)
    img: np.ndarray  # (H, W, 3) float32, 0..255 (NHWC)
    label_2d: np.ndarray  # (H, W) int64
    binary_label_2d: np.ndarray  # (128, 128) float32
    caption_tokens: np.ndarray  # (77,) int32 CLIP BPE tokens


def pack_targets(label_2d: np.ndarray, max_targets: int, num_base: int):
    """Per-sample GT mask targets from unique 2D-label values
    (reference xmask3d.py:189-224): labels (T,) + per-target validity.

    Masks themselves are NOT materialized on host: the device derives
    mask_t = (label_2d == target_label_t) — cheap and fused.
    """
    uniq = np.unique(label_2d)
    t = len(uniq)
    labels = np.full((max_targets,), -1, dtype=np.int32)
    labels[: min(t, max_targets)] = uniq[:max_targets]
    valid = labels >= 0
    return labels, valid


def collate_views(
    samples: List[ViewSample],
    caps: Capacities,
    num_base: int,
    device_hierarchy: bool = False,
    grid_jitter_rng: Any = None,
) -> Dict[str, Any]:
    """Pad and stack view samples into a fixed-shape batch dict (numpy).

    device_hierarchy=True skips the host kernel-map build and ships only
    (voxel_coords, voxel_num); the model builds the hierarchy on device
    (ops/hierarchy_device.py) — ~15 MB/view less H2D traffic. Stride-1
    coords are clamped below 1024/axis (the device builder's int32 key
    budget; 20 m at 2 cm voxels).

    grid_jitter_rng (train only): the reference adds a shared uniform
    [0, 100) shift to the whole batch's voxel coords before SparseTensor
    construction (run/train.py:481: `coords[:, 1:4] += torch.rand(3)*100`).
    Since the coords are integers, floor quantization makes this an integer
    translation — a NO-OP for stride-1 conv topology, but NOT for strided
    levels: parent assignment is `(c // s) * s`, so the shift mod 16
    re-randomizes which voxels pool together at every stride. It is a
    grid-alignment augmentation. Pass a numpy RandomState to enable; one
    shift is drawn per batch (reference semantics).
    """
    hs, batch = [], {}
    p, v = caps.max_points, caps.max_voxels
    vox_coords, vox_num = [], []
    vox_feats, point_fields = [], {
        "inds_reconstruct": [],
        "labels_3d": [],
        "binary_label_3d": [],
        "x_label": [],
        "y_label": [],
    }
    point_valid, tgt_labels, tgt_valid = [], [], []
    # a translation only matters mod 16 (the deepest stride), so draw in
    # [0, 16) instead of the reference's [0, 100) — same augmentation
    # family, and it keeps coords inside the 1024/axis key budget without
    # wrapping (which would corrupt adjacency at the boundary)
    jitter = (
        grid_jitter_rng.randint(0, 16, size=(1, 3)).astype(np.int32)
        if grid_jitter_rng is not None
        else None
    )
    for s in samples:
        coords = s.voxel_coords[:v].astype(np.int32)
        if jitter is not None:
            coords = coords + jitter
        coords = np.clip(coords, 0, 1023)
        if device_hierarchy:
            vox_coords.append(_pad1(coords, v))
            vox_num.append(np.int32(len(coords)))
        else:
            hs.append(build_hierarchy(coords, caps.level_caps()))
        vox_feats.append(_pad1(s.voxel_feats.astype(np.float32), v))
        n_pts = min(len(s.inds_reconstruct), p)
        pv = np.zeros((p,), bool)
        pv[:n_pts] = True
        # points whose voxel fell beyond capacity are invalidated
        ir = _pad1(s.inds_reconstruct.astype(np.int32), p)
        pv &= ir < v
        point_valid.append(pv)
        point_fields["inds_reconstruct"].append(np.where(pv, ir, 0))
        point_fields["labels_3d"].append(_pad1(s.labels_3d.astype(np.int32), p))
        point_fields["binary_label_3d"].append(
            _pad1(s.binary_label_3d.astype(np.float32), p)
        )
        point_fields["x_label"].append(_pad1(s.x_label.astype(np.int32), p))
        point_fields["y_label"].append(_pad1(s.y_label.astype(np.int32), p))
        tl, tv = pack_targets(s.label_2d, caps.max_targets, num_base)
        tgt_labels.append(tl)
        tgt_valid.append(tv)

    if device_hierarchy:
        batch["voxel_coords"] = np.stack(vox_coords)
        batch["voxel_num"] = np.stack(vox_num)
    else:
        batch["hierarchy"] = stack_hierarchies(hs)
    batch["voxel_feats"] = np.stack(vox_feats)
    batch["point_valid"] = np.stack(point_valid)
    for k, vals in point_fields.items():
        batch[k] = np.stack(vals)
    batch["img"] = np.stack([s.img.astype(np.float32) for s in samples])
    batch["label_2d"] = np.stack([s.label_2d.astype(np.int32) for s in samples])
    batch["binary_label_2d"] = np.stack(
        [s.binary_label_2d.astype(np.float32) for s in samples]
    )
    batch["caption_tokens"] = np.stack(
        [s.caption_tokens.astype(np.int32) for s in samples]
    )
    batch["target_labels"] = np.stack(tgt_labels)
    batch["target_valid"] = np.stack(tgt_valid)
    return batch
