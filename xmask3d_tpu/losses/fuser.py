"""2D->3D mask painting and feature fusion as batched segment ops.

Capability parity with the reference models/utils/fuser.py:6-72
(mask_mapper + FeatureMerger): each mask paints its 768-d embedding onto its
projected points, count-normalized, then fused with the 3D branch feature by
a Linear(1536->768). The reference's per-mask Python loop becomes one
einsum over (Q, P) boolean membership — the static-shape, MXU-friendly
formulation.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FeatureMerger(nn.Module):
    """concat + Linear fusion head (reference fuser.py:64-72)."""

    feature_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_2d: jnp.ndarray, feat_3d: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([feat_2d, feat_3d], axis=-1)
        return nn.Dense(self.feature_dim, dtype=self.dtype, name="linear")(x)


def project_masks_to_points(
    masks: jnp.ndarray,  # (B, Q, Hm, Wm)
    x_label: jnp.ndarray,  # (B, P) row indices in [0, Hm)
    y_label: jnp.ndarray,  # (B, P) col indices in [0, Wm)
) -> jnp.ndarray:
    """Gather mask values at projected point pixels -> (B, Q, P).

    Equivalent of the reference's `mask[:, x_label, y_label]` fancy indexing
    (fuser.py:16, xmask3d.py:356).
    """
    import os

    b, q, hm, wm = masks.shape
    flat = masks.reshape(b, q, hm * wm)
    idx = jnp.clip(x_label, 0, hm - 1) * wm + jnp.clip(y_label, 0, wm - 1)
    if os.environ.get("XMASK3D_POINT_GATHER", "lane") == "row":
        # transposed form: gather ROWS of (HW, Q) instead of lanes of
        # (Q, HW) — the per-point index is shared across Q, so each gather
        # reads a full Q-wide vector row; candidate for the TPU where
        # minor-axis gathers serialize (measure via profile_components
        # 'mask point gather'; numerics identical)
        flat_t = flat.transpose(0, 2, 1)  # (B, HW, Q)
        out = jnp.take_along_axis(flat_t, idx[:, :, None], axis=1)
        return out.transpose(0, 2, 1)
    return jnp.take_along_axis(flat, idx[:, None, :], axis=2)


def paint_and_fuse(
    mask_3d: jnp.ndarray,  # (B, Q, P) bool mask membership per point
    q_valid: jnp.ndarray,  # (B, Q) bool
    mask_embeds: jnp.ndarray,  # (B, Q, C)
    pred_3d: jnp.ndarray,  # (B, P, C)
    point_valid: jnp.ndarray,  # (B, P)
    fuser: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Batched mask_mapper (reference fuser.py:6-53).

    Returns dict with:
      fused:   (B, P, C) fused feature (3D-only where no mask covers a point)
      feat_2d: (B, P, C) painted count-normalized 2D feature
      counter: (B, P) number of masks covering each point
      covered: (B, P) bool, counter >= 1 (the reference's need_fused split)
    """
    m = (mask_3d & q_valid[:, :, None] & point_valid[:, None, :]).astype(
        pred_3d.dtype
    )
    # fallback: a scene with zero covered points paints query 0 on point 0
    # (reference fuser.py:19-20)
    empty = jnp.sum(m, axis=(1, 2)) == 0
    m = m.at[:, 0, 0].set(jnp.where(empty, 1.0, m[:, 0, 0]))

    # fp32 accumulation: summing up to Q mask embeddings in bf16 loses
    # ~3 bits of the result; the MXU accumulates fp32 for free and the
    # downstream ensemble math is fp32 anyway (engine/infer.py)
    painted = jnp.einsum(
        "bqp,bqc->bpc", m, mask_embeds, preferred_element_type=jnp.float32
    )
    counter = jnp.sum(m.astype(jnp.float32), axis=1)  # (B, P)
    feat_2d = (painted / jnp.maximum(counter[..., None], 1e-5)).astype(
        pred_3d.dtype
    )
    # counter stays fp32: >256 covering masks would round in bf16
    covered = counter >= 1.0
    fused_all = fuser(feat_2d, pred_3d)
    fused = jnp.where(covered[..., None], fused_all, pred_3d)
    return {
        "fused": fused,
        "feat_2d": feat_2d,
        "counter": counter,
        "covered": covered,
    }


def masked_mean(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int, eps: float = 1e-8
) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    return (x * m).sum(axis=axis) / (m.sum(axis=axis) + eps)


def panoptic_mask_filter(
    scores: jnp.ndarray,  # (B, Q) confidence per query
    masks: jnp.ndarray,  # (B, Q, H, W) mask logits
    keep: jnp.ndarray,  # (B, Q) bool pre-filter (e.g. scores > thresh)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape panoptic-style mask filtering.

    Re-expresses the reference's order-sensitive per-query loop
    (xmask3d.py:416-439, criterion.py:297-311): each pixel is claimed by the
    query maximizing score * sigmoid(mask); a query survives if it claims at
    least one pixel that also passes its own 0.5 threshold.

    Returns:
      final_masks: (B, Q, H, W) bool — (argmax claim) & (sigmoid >= 0.5)
      final_valid: (B, Q) bool — query has a nonempty final mask, was kept,
        and had nonempty original area.
    """
    sig = jax.nn.sigmoid(masks)
    prob = scores[:, :, None, None] * sig
    neg = jnp.asarray(-1e30, prob.dtype)
    prob = jnp.where(keep[:, :, None, None], prob, neg)
    claim = jnp.argmax(prob, axis=1)  # (B, H, W)
    q_ids = jnp.arange(masks.shape[1])[None, :, None, None]
    final = (claim[:, None] == q_ids) & (sig >= 0.5) & keep[:, :, None, None]
    orig_area = (sig >= 0.5).sum(axis=(-1, -2))
    final_valid = (final.sum(axis=(-1, -2)) > 0) & (orig_area > 0) & keep
    final = final & final_valid[:, :, None, None]
    return final, final_valid
