"""Point sampling utilities for mask losses.

Replaces detectron2's point_sample / get_uncertain_point_coords_with_randomness
used by the vendored mask2former criterion (criterion.py:129-197) and matcher
(matcher.py:96-156). Bilinear sampling uses grid_sample align_corners=False
semantics (pixel = coord * size - 0.5, zero padding).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from xmask3d_tpu.ops.deform_attn import bilinear_sample_nhwc


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (B, Q, H, W) mask logits at (B, N, 2) normalized xy coords.

    Returns (B, Q, N).
    """
    b, q, h, w = masks.shape
    img = masks.transpose(0, 2, 3, 1)  # (B, H, W, Q) as channels
    px = coords[..., 0] * w - 0.5
    py = coords[..., 1] * h - 0.5
    out = bilinear_sample_nhwc(img, px, py)  # (B, N, Q)
    return out.transpose(0, 2, 1)


def uncertainty_sampled_points(
    rng: jax.Array,
    mask_logits: jnp.ndarray,  # (B, Q, H, W)
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Importance sampling of points by uncertainty -|logit| per query set.

    The mask2former recipe (12544 pts, oversample 3.0, importance 0.75):
    sample N*k random points, keep the most uncertain 75% measured on the
    per-query max-uncertainty map, refill 25% uniformly. Here uncertainty is
    reduced over Q (queries share one point set per image, like the
    reference criterion's per-image call shape).

    Returns (B, N, 2) coords in [0, 1].
    """
    b = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (b, n_sampled, 2))
    logits = point_sample(mask_logits, coords)  # (B, Q, n_sampled)
    uncertainty = -jnp.abs(logits).min(axis=1)  # most certain query decides
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    _, idx = jax.lax.top_k(uncertainty, n_unc)
    top = jnp.take_along_axis(coords, idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (b, n_rand, 2))
    return jnp.concatenate([top, rand], axis=1)


def dice_loss_pairwise(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Pairwise dice cost on sampled points: (Q, N), (T, N) -> (Q, T)."""
    p = jax.nn.sigmoid(inputs)
    num = 2 * jnp.einsum("qn,tn->qt", p, targets)
    den = p.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1 - (num + 1) / (den + 1)


def sigmoid_ce_pairwise(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Pairwise mean sigmoid-CE cost: (Q, N), (T, N) -> (Q, T)."""
    n = inputs.shape[-1]
    pos = jax.nn.softplus(-inputs)  # CE for target 1
    neg = jax.nn.softplus(inputs)  # CE for target 0
    return (
        jnp.einsum("qn,tn->qt", pos, targets) + jnp.einsum("qn,tn->qt", neg, 1 - targets)
    ) / n


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise-matched dice loss: (M, N) logits vs (M, N) {0,1}."""
    p = jax.nn.sigmoid(inputs)
    num = 2 * (p * targets).sum(-1)
    den = p.sum(-1) + targets.sum(-1)
    return 1 - (num + 1) / (den + 1)


def sigmoid_ce_loss(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean per-point sigmoid CE: (M, N) -> (M,)."""
    ce = jax.nn.softplus(inputs) - inputs * targets
    return ce.mean(-1)
