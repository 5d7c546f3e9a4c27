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
