"""Hungarian matcher with point-sampled mask costs, fully on device.

Capability parity with the vendored mask2former HungarianMatcher
(matcher.py:96-156): per-image cost = cost_class * (-prob) +
cost_mask * pairwise sigmoid-CE + cost_dice * pairwise dice, evaluated on a
shared random point sample; assignment by the on-device JV solver
(ops/hungarian.py) instead of a scipy CPU sync.

Static shapes: targets are padded to T_max with a validity mask; padded
rows get a constant cost so they absorb leftover queries harmlessly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from xmask3d_tpu.ops.hungarian import linear_sum_assignment
from xmask3d_tpu.ops.point_sample import (
    dice_loss_pairwise,
    point_sample,
    sigmoid_ce_pairwise,
)


def hungarian_match(
    rng: jax.Array,
    pred_logits: jnp.ndarray,  # (B, Q, C+1)
    pred_masks: jnp.ndarray,  # (B, Q, H, W) logits
    target_labels: jnp.ndarray,  # (B, T) int32, -1 pad
    target_masks: jnp.ndarray,  # (B, T, Ht, Wt) float 0/1
    target_valid: jnp.ndarray,  # (B, T) bool
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jnp.ndarray:
    """Returns (B, T) int32: matched query per target (valid rows only
    meaningful)."""
    b, q = pred_logits.shape[:2]
    t = target_labels.shape[1]
    coords = jax.random.uniform(rng, (b, num_points, 2))

    pred_pts = point_sample(pred_masks, coords)  # (B, Q, N)
    tgt_pts = point_sample(target_masks, coords)  # (B, T, N)

    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    safe_labels = jnp.clip(target_labels, 0, pred_logits.shape[-1] - 1)

    def one(prob_i, pred_i, tgt_i, labels_i, valid_i):
        c_class = -jnp.take(prob_i, labels_i, axis=-1)  # (Q, T)
        c_mask = sigmoid_ce_pairwise(pred_i, tgt_i)
        c_dice = dice_loss_pairwise(pred_i, tgt_i)
        cost = cost_class * c_class + cost_mask * c_mask + cost_dice * c_dice
        cost = jnp.where(valid_i[None, :], cost, 0.0)  # uniform pad rows
        return linear_sum_assignment(cost.T)  # (T,)

    return jax.vmap(one)(prob, pred_pts, tgt_pts, safe_labels, target_valid)
