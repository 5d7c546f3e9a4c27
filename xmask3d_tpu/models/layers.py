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


def upsample_nearest_int(x, sh: int, sw: int):
    """Integer-factor nearest-neighbor upsample of (B, H, W, C) via
    broadcast+reshape — identical values to jax.image.resize(method="nearest")
    at integer scales (output pixel i maps to input floor((i+0.5)/s), which
    is plain repetition for integer s), but lowers to a fused broadcast
    instead of a gather on TPU (the resize gathers cost the SD UNet ~7 ms
    before the swap — BASELINE.md round 3)."""
    import jax.numpy as jnp

    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, sh, w, sw, c))
    return x.reshape(b, h * sh, w * sw, c)


def upsample2x_nearest(x):
    """Exact 2x nearest-neighbor upsample (see upsample_nearest_int)."""
    return upsample_nearest_int(x, 2, 2)
