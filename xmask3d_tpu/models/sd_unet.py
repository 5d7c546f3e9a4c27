"""Stable Diffusion v1 denoising UNet in Flax, NHWC, with feature taps and
an additive conditioning offset on the time embedding.

Capability parity with the reference's manual UNet forward
(ldm.py:425-446): runs the full input/middle/output block stack with text
cross-attention `context` (B, 77, 768), supports the implicit-captioner's
`cond_emb` added onto the time embedding, and returns the features at the
configured output-block indices — the concatenated [h, skip] *inputs* of
those blocks, exactly what the reference taps (ldm.py:441-443).

Architecture (SD v1): model_channels=320, ch_mult=(1,2,4,4),
num_res_blocks=2, attention at every level except the innermost is per
`attention_levels`, 8 heads, context_dim=768, transformer depth 1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


from xmask3d_tpu.models.layers import group_norm, upsample2x_nearest
from xmask3d_tpu.ops.flash_attention import attention
from xmask3d_tpu.parallel.mesh import shard_spatial


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    attention_levels: Sequence[int] = (0, 1, 2)  # attn_res (4,2,1) in latent units
    num_heads: int = 8
    context_dim: int = 768


UNET_TINY = UNetConfig(
    model_channels=32, ch_mult=(1, 1, 2, 2), num_res_blocks=2,
    attention_levels=(0, 1, 2), num_heads=2, context_dim=24,
)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding (standard DDPM/LDM formulation)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class UNetResBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = group_norm(x.shape[-1], self.dtype, "in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)
        e = nn.Dense(self.out_ch, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = group_norm(h.shape[-1], self.dtype, "out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class _ProjKernel(nn.Module):
    """Bias-free projection kernel with nn.Dense's exact param layout
    (`<name>/kernel`, lecun_normal, fp32 storage) but returned as the raw
    weight — lets CrossAttention concatenate Q/K/V kernels and run ONE
    (T, c)@(c, 3c) matmul instead of three (T, c)@(c, c). One wide matmul
    tiles the MXU better at the SD UNet's c=320 than three narrow ones;
    per-output-element contraction is unchanged, so numerics are exact."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )


class CrossAttention(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        c = x.shape[-1]
        d = c // self.heads
        cin = ctx.shape[-1]
        wq = _ProjKernel(c, name="to_q")(c).astype(self.dtype)
        wk = _ProjKernel(c, name="to_k")(cin).astype(self.dtype)
        wv = _ProjKernel(c, name="to_v")(cin).astype(self.dtype)
        def mm(a, w):
            return a @ w

        if context is None:
            qkv = mm(x, jnp.concatenate([wq, wk, wv], axis=1))
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = mm(x, wq)
            kv = mm(ctx, jnp.concatenate([wk, wv], axis=1))
            k, v = jnp.split(kv, 2, axis=-1)

        def split(z):
            return z.reshape(z.shape[0], z.shape[1], self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # Pallas flash attention on TPU (4096-token self-attn at 512^2
        # inputs); XLA fallback on CPU / unsupported shapes
        out = attention(q, k, v).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], c)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.out_dim, dtype=self.dtype, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(b)


class BasicTransformerBlock(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        c = x.shape[-1]
        x = x + CrossAttention(self.heads, dtype=self.dtype, name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        )
        x = x + CrossAttention(self.heads, dtype=self.dtype, name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context
        )
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        y = GEGLU(4 * c, dtype=self.dtype, name="ff_geglu")(y)
        x = x + nn.Dense(c, dtype=self.dtype, name="ff_out")(y)
        return x


class SpatialTransformer(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        y = group_norm(x.shape[-1], self.dtype, "norm")(x)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        y = BasicTransformerBlock(self.heads, dtype=self.dtype, name="block_0")(
            y, context
        )
        y = y.reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return x + y


class SDUNet(nn.Module):
    cfg: UNetConfig = UNetConfig()
    tap_indices: Sequence[int] = (2, 5, 8, 11)  # reference unet_block_indices

    dtype: Any = jnp.float32
    # BLOCK-level gradient checkpointing: each res/transformer block is
    # rematerialized independently, so backward peak holds only block
    # boundaries + one block's internals (whole-module remat around the
    # backbone does NOT reduce peak — its backward recomputes the entire
    # forward at once). Free in eval mode.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, h, w, 4) noisy latent
        t: jnp.ndarray,  # (B,) timesteps
        context: jnp.ndarray,  # (B, 77, context_dim) text conditioning
        cond_emb: Optional[jnp.ndarray] = None,  # (B, 4*model_ch) additive
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        cfg = self.cfg
        mc = cfg.model_channels
        ResBlock = nn.remat(UNetResBlock) if self.remat else UNetResBlock
        SpatialT = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer
        temb = timestep_embedding(t, mc)
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_0")(
            temb.astype(self.dtype)
        )
        emb = nn.Dense(4 * mc, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))
        if cond_emb is not None:
            # implicit captioner offset on the time embedding (ldm.py:432-433)
            emb = emb + cond_emb.astype(self.dtype)

        n_lv = len(cfg.ch_mult)
        taps: List[jnp.ndarray] = []
        hs: List[jnp.ndarray] = []
        h = shard_spatial(
            nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(
                x.astype(self.dtype)
            )
        )
        hs.append(h)
        # input blocks (shard_spatial: opt-in activation sharding for TP
        # training fit — no-op unless parallel.mesh.activation_sharding is on)
        for lv, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = ResBlock(mc * mult, dtype=self.dtype, name=f"down_{lv}_res_{i}")(
                    h, emb
                )
                if lv in cfg.attention_levels:
                    h = SpatialT(
                        cfg.num_heads, dtype=self.dtype, name=f"down_{lv}_attn_{i}"
                    )(h, context)
                h = shard_spatial(h)
                hs.append(h)
            if lv != n_lv - 1:
                h = shard_spatial(nn.Conv(
                    h.shape[-1], (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name=f"down_{lv}_downsample",
                )(h))
                hs.append(h)

        # middle
        h = ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res_0")(h, emb)
        h = SpatialT(cfg.num_heads, dtype=self.dtype, name="mid_attn")(
            h, context
        )
        h = shard_spatial(
            ResBlock(h.shape[-1], dtype=self.dtype, name="mid_res_1")(h, emb)
        )

        # output blocks
        out_idx = 0
        for rev, lv in enumerate(reversed(range(n_lv))):
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                if out_idx in self.tap_indices:
                    taps.append(h)  # tap = concatenated block input
                h = ResBlock(
                    mc * cfg.ch_mult[lv], dtype=self.dtype, name=f"up_{lv}_res_{i}"
                )(h, emb)
                if lv in cfg.attention_levels:
                    h = SpatialT(
                        cfg.num_heads, dtype=self.dtype, name=f"up_{lv}_attn_{i}"
                    )(h, context)
                h = shard_spatial(h)
                if lv != 0 and i == cfg.num_res_blocks:
                    h = upsample2x_nearest(h)
                    h = shard_spatial(nn.Conv(
                        h.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                        name=f"up_{lv}_upsample",
                    )(h))
                out_idx += 1

        h = group_norm(h.shape[-1], self.dtype, "out_norm")(h)
        h = nn.silu(h)
        eps = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="out_conv"
        )(h)
        return eps, taps
