"""Small shared layers/helpers."""

from __future__ import annotations

from flax import linen as nn


def gn_groups(channels: int, preferred: int = 32) -> int:
    """Largest group count <= preferred that divides `channels` (SD/CLIP use
    32; tiny test configs have fewer channels)."""
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


def group_norm(channels: int, dtype, name: str, preferred: int = 32) -> nn.GroupNorm:
    return nn.GroupNorm(gn_groups(channels, preferred), dtype=dtype, name=name)


def upsample2x_nearest(x):
    """Exact 2x nearest-neighbor upsample of (B, H, W, C) via
    broadcast+reshape — identical values to jax.image.resize(method="nearest")
    at integer scale 2 (each pixel repeated 2x2), but lowers to a fused
    broadcast instead of a gather on TPU."""
    import jax.numpy as jnp

    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
