"""Focal loss (capability parity with util/util.py:300 FocalLoss — declared
in the reference but unused on the main path; provided for completeness)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(
    logits: jnp.ndarray,  # (..., C)
    labels: jnp.ndarray,  # (...,) int
    gamma: float = 2.0,
    alpha: float = 0.25,
    ignore_index: int = 255,
) -> jnp.ndarray:
    keep = labels != ignore_index
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    loss = alpha * (1 - pt) ** gamma * ce
    k = keep.astype(jnp.float32)
    return (loss * k).sum() / jnp.maximum(k.sum(), 1.0)
