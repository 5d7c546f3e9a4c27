"""Metrics: IoU histograms and meters.

Capability parity with the reference's util/util.py:87-156 (AverageMeter,
intersectionAndUnionGPU), re-expressed TPU-first: the histogram is computed
on device with one-hot segment sums (jit-able, psum-able across a mesh axis)
instead of the reference's CPU round-trip (`torch.histc` on copies).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Running average of host-side scalars."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0.0
        self.avg = 0.0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1e-12)


def intersection_and_union(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: Sequence[int] = (255,),
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class (intersection, union, target) histograms.

    Matches the semantics of the reference intersectionAndUnionGPU
    (util/util.py:139-156) with multi-ignore-index support, but fully
    on-device and static-shape: padded elements are excluded via `valid`.

    Returns three (num_classes,) float32 arrays; sum them over a mesh axis
    with lax.psum for the distributed reduction (reference: dist.all_reduce
    at run/train.py:640-652).
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    keep = jnp.ones_like(target, dtype=bool)
    for ig in ignore_index:
        keep &= target != ig
    if valid is not None:
        keep &= valid.reshape(-1)

    # reference sets pred = target on ignored positions, then histograms;
    # here we simply exclude those positions from every histogram.
    def hist(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        oh = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
        return jnp.sum(oh * mask[:, None].astype(jnp.float32), axis=0)

    inter = hist(pred, keep & (pred == target))
    area_pred = hist(pred, keep)
    area_target = hist(target, keep)
    union = area_pred + area_target - inter
    return inter, union, area_target


def miou_from_histograms(
    inter: np.ndarray, union: np.ndarray, eps: float = 1e-10
) -> np.ndarray:
    return np.asarray(inter) / (np.asarray(union) + eps)


def hiou(miou_base: float, miou_novel: float, eps: float = 1e-10) -> float:
    """Harmonic mean of base and novel mIoU (the headline XMask3D metric)."""
    return 2 * miou_base * miou_novel / (miou_base + miou_novel + eps)
