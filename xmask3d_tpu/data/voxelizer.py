"""Host-side voxelization: sparse quantization + augmented rigid transforms.

Capability parity with the reference's dataset/voxelizer.py:11-132 and
dataset/voxelization_utils.py:6-102. Runs on host (numpy); output feeds the
static-shape batcher. Dedup uses exact int64 bit-packing instead of the
reference's FNV-1a 64-bit hash (same semantics, zero collision risk).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _rotation_matrix(axis: np.ndarray, theta: float) -> np.ndarray:
    """Rodrigues rotation about `axis` by `theta` (reference uses expm of the
    cross-product matrix — identical result)."""
    a = axis / np.linalg.norm(axis)
    kx, ky, kz = a
    k = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    return np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)


_BITS = 20


def _pack_nonneg(c: np.ndarray) -> np.ndarray:
    c = c.astype(np.int64)
    return (c[:, 0] << (2 * _BITS)) | (c[:, 1] << _BITS) | c[:, 2]


def sparse_quantize(
    coords: np.ndarray, return_index: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Deduplicate integer coords.

    Returns (inds, inds_reconstruct): `inds` selects one representative point
    per voxel (first occurrence in np.unique key order, matching the
    reference's np.unique(key) at voxelization_utils.py:95), and
    `inds_reconstruct` maps each point to its voxel row.
    """
    assert coords.ndim == 2 and coords.shape[1] == 3
    c = coords.astype(np.int64)
    c = c - c.min(0)  # ensure non-negative for packing
    key = _pack_nonneg(c)
    _, inds, inds_reverse = np.unique(key, return_index=True, return_inverse=True)
    return inds, inds_reverse


class Voxelizer:
    """Random rot/scale/translation-augmented quantization to a voxel grid."""

    def __init__(
        self,
        voxel_size: float = 0.05,
        clip_bound=None,
        use_augmentation: bool = False,
        scale_augmentation_bound=None,
        rotation_augmentation_bound=None,
        translation_augmentation_ratio_bound=None,
        ignore_label: int = 255,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.voxel_size = voxel_size
        self.clip_bound = clip_bound
        self.ignore_label = ignore_label
        self.use_augmentation = use_augmentation
        self.scale_augmentation_bound = scale_augmentation_bound
        self.rotation_augmentation_bound = rotation_augmentation_bound
        self.translation_augmentation_ratio_bound = translation_augmentation_ratio_bound
        self.rng = rng or np.random.RandomState()

    def _transforms(self) -> Tuple[np.ndarray, np.ndarray]:
        voxelization_matrix, rotation_matrix = np.eye(4), np.eye(4)
        rot = np.eye(3)
        if self.use_augmentation and self.rotation_augmentation_bound is not None:
            mats = []
            for axis_ind, bound in enumerate(self.rotation_augmentation_bound):
                theta = self.rng.uniform(*bound) if bound is not None else 0.0
                axis = np.zeros(3)
                axis[axis_ind] = 1
                mats.append(_rotation_matrix(axis, theta))
            self.rng.shuffle(mats)
            rot = mats[0] @ mats[1] @ mats[2]
        rotation_matrix[:3, :3] = rot

        scale = 1 / self.voxel_size
        if self.use_augmentation and self.scale_augmentation_bound is not None:
            scale *= self.rng.uniform(*self.scale_augmentation_bound)
        np.fill_diagonal(voxelization_matrix[:3, :3], scale)
        return voxelization_matrix, rotation_matrix

    def _clip(self, coords, center=None, trans_aug_ratio=None):
        bound_min = coords.min(0).astype(float)
        bound_max = coords.max(0).astype(float)
        bound_size = bound_max - bound_min
        if center is None:
            center = bound_min + bound_size * 0.5
        if trans_aug_ratio is not None:
            center = center + trans_aug_ratio * bound_size
        lim = self.clip_bound
        keep = np.ones(len(coords), bool)
        for ax in range(3):
            keep &= (coords[:, ax] >= lim[ax][0] + center[ax]) & (
                coords[:, ax] < lim[ax][1] + center[ax]
            )
        return keep

    def voxelize(self, coords, feats, labels, center=None):
        """Returns (voxel_coords int, voxel_feats, voxel_labels,
        inds_reconstruct): the reference voxelize contract
        (voxelizer.py:81-132)."""
        assert coords.shape[1] == 3 and coords.shape[0] == feats.shape[0]
        if self.clip_bound is not None:
            trans_aug_ratio = np.zeros(3)
            if self.use_augmentation and self.translation_augmentation_ratio_bound is not None:
                for ax, bound in enumerate(self.translation_augmentation_ratio_bound):
                    trans_aug_ratio[ax] = self.rng.uniform(*bound)
            keep = self._clip(coords, center, trans_aug_ratio)
            if keep.sum():
                coords, feats = coords[keep], feats[keep]
                if labels is not None:
                    labels = labels[keep]

        m_v, m_r = self._transforms()
        rigid = m_r @ m_v if self.use_augmentation else m_v
        homo = np.hstack([coords, np.ones((len(coords), 1), coords.dtype)])
        coords_aug = np.floor(homo @ rigid.T[:, :3])
        coords_aug = np.floor(coords_aug - coords_aug.min(0))

        inds, inds_reconstruct = sparse_quantize(coords_aug)
        # NOTE on voxel order: np.unique over the packed key leaves voxels in
        # lexicographic (x, y, z) scan order. That order is load-bearing for
        # the Pallas sparse-conv kernel (ops/sparse_conv_pallas.py): a fixed
        # kernel-tap offset shifts a voxel's rank by at most one x-slab /
        # y-row, so kernel maps are band-local. (A Morton/Z-order layout was
        # measured WORSE here — octant-boundary crossings make p95 bands ~3x
        # wider on volumetric point sets.)
        coords_out = coords_aug[inds].astype(np.int32)
        feats_out = feats[inds]
        labels_out = labels[inds] if labels is not None else None

        if feats_out.shape[1] > 6:  # rotate normals if present
            feats_out = feats_out.copy()
            feats_out[:, 3:6] = feats_out[:, 3:6] @ m_r[:3, :3].T

        return coords_out, feats_out, labels_out, inds_reconstruct.astype(np.int64)
