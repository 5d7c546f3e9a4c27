"""Stable Diffusion v1 VAE (AutoencoderKL) in Flax, NHWC, with feature taps.

Capability parity with the reference's use of the `ldm` package's
first_stage_model: the VAE encoder/decoder with intermediate features
captured at configured block indices (reference ldm.py:386-414 encoder taps,
ldm.py:448-482 decoder taps). Taps are explicit return values — the
TPU-native replacement for Python block hooks.

Architecture (SD v1 AutoencoderKL): ch=128, ch_mult=(1,2,4,4),
num_res_blocks=2, z=4, GroupNorm(32) + SiLU(swish), single-head spatial
attention in the mid block. Weights convert from sd-v1-*.ckpt via
checkpoint/convert_torch.py (NCHW->NHWC).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


from xmask3d_tpu.models.layers import gn_groups, group_norm, upsample2x_nearest
from xmask3d_tpu.ops.flash_attention import attention
from xmask3d_tpu.ops.gn_conv import fused_available, gn_silu_conv
from xmask3d_tpu.parallel.mesh import shard_spatial


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    scale_factor: float = 0.18215


# tiny config keeps SD's stride topology (same tap indices/strides) with
# small channel counts, so the backbone emits the full s2..s5 pyramid
VAE_TINY = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=2)


class _GNParams(nn.Module):
    """Parameter container with flax GroupNorm's exact tree ({scale, bias})
    so the fused GN->conv path keeps checkpoint compatibility."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.features,)),
            self.param("bias", nn.initializers.zeros_init(), (self.features,)),
        )


class _Conv3Params(nn.Module):
    """Parameter container with nn.Conv's exact tree ({kernel, bias})."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (3, 3, self.in_features, self.features),
            ),
            self.param("bias", nn.initializers.zeros_init(), (self.features,)),
        )


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    def _gn_silu_conv(self, x, norm_name: str, conv_name: str):
        """One GN -> SiLU -> conv3x3 stage, fused on TPU when supported
        (ops/gn_conv.py: saves the HBM round-trip of the normalized
        activation). Param trees are identical to the module path, so
        init/apply may take different branches across processes and
        checkpoints stay compatible."""
        c = x.shape[-1]
        if fused_available(x.shape, self.out_ch, self.dtype):
            scale, bias = _GNParams(c, name=norm_name)()
            kernel, cbias = _Conv3Params(self.out_ch, c, name=conv_name)()
            return gn_silu_conv(
                x.astype(self.dtype), scale, bias, kernel, cbias,
                groups=gn_groups(c, 32),
            )
        h = group_norm(c, self.dtype, norm_name)(x)
        h = nn.silu(h)
        return nn.Conv(
            self.out_ch, (3, 3), padding=1, dtype=self.dtype, name=conv_name
        )(h)

    @nn.compact
    def __call__(self, x):
        h = self._gn_silu_conv(x, "norm1", "conv1")
        h = self._gn_silu_conv(h, "norm2", "conv2")
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over HxW (VAE mid block)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = group_norm(x.shape[-1], self.dtype, "norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, 1, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, 1, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, 1, h * w, c)
        # flash path on TPU: at 64^2 latents the XLA formulation materializes
        # a (4096, 4096) fp32 score matrix (67 MB of HBM round-trips)
        out = attention(q, k, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # SD VAE uses asymmetric (0,1) padding for the strided conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = upsample2x_nearest(x)
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class VAEEncoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    tap_indices: Sequence[int] = (5, 7)  # reference encoder_block_indices
    dtype: Any = jnp.float32
    remat: bool = False  # block-level gradient checkpointing

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """x: (B,H,W,3) normalized image. Returns (moments (B,h,w,2z), taps).

        Taps capture the *input* of the flattened down-blocks listed in
        tap_indices (reference ldm.py:386-414 captures hs[-1] before the
        block runs).
        """
        c = self.cfg
        RB = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        AB = nn.remat(AttnBlock) if self.remat else AttnBlock
        taps = []
        flat_idx = 0
        h = shard_spatial(
            nn.Conv(c.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        )
        # shard_spatial: opt-in activation sharding for TP training fit —
        # no-op unless parallel.mesh.activation_sharding is enabled
        for i_level, mult in enumerate(c.ch_mult):
            for i_block in range(c.num_res_blocks):
                if flat_idx in self.tap_indices:
                    taps.append(h)
                h = shard_spatial(RB(
                    c.ch * mult, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h))
                flat_idx += 1
            if i_level != len(c.ch_mult) - 1:
                h = shard_spatial(
                    Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                )
        h = RB(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AB(dtype=self.dtype, name="mid_attn_1")(h)
        h = shard_spatial(RB(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h))
        h = group_norm(h.shape[-1], self.dtype, "norm_out")(h)
        h = h * jax.nn.sigmoid(h)  # swish, as written in the LDM encoder tail
        h = nn.Conv(
            2 * c.z_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return h, taps


class VAEDecoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    tap_indices: Sequence[int] = (2, 5)  # reference decoder_block_indices
    dtype: Any = jnp.float32
    remat: bool = False  # block-level gradient checkpointing

    @nn.compact
    def __call__(self, z) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """z: (B,h,w,z). Returns (rgb (B,H,W,3), taps). Taps index the
        flattened up-blocks from lowest resolution (reference ldm.py:448-482).
        """
        c = self.cfg
        RB = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        AB = nn.remat(AttnBlock) if self.remat else AttnBlock
        taps = []
        n_lv = len(c.ch_mult)
        block_in = c.ch * c.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = RB(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AB(dtype=self.dtype, name="mid_attn_1")(h)
        h = shard_spatial(RB(block_in, dtype=self.dtype, name="mid_block_2")(h))
        flat_idx = 0
        for rev, i_level in enumerate(reversed(range(n_lv))):
            out_ch = c.ch * c.ch_mult[i_level]
            for i_block in range(c.num_res_blocks + 1):
                if flat_idx in self.tap_indices:
                    taps.append(h)
                h = shard_spatial(RB(
                    out_ch, dtype=self.dtype, name=f"up_{i_level}_block_{i_block}"
                )(h))
                flat_idx += 1
            if i_level != 0:
                h = shard_spatial(
                    Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                )
        h = group_norm(h.shape[-1], self.dtype, "norm_out")(h)
        h = h * jax.nn.sigmoid(h)
        h = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h, taps


class AutoencoderKL(nn.Module):
    """VAE with quant/post-quant convs and deterministic (mean) latents,
    matching the reference's encode path (ldm.py:416-423: latent =
    scale_factor * posterior.mean) and decode path (ldm.py:484-490)."""

    cfg: VAEConfig = VAEConfig()
    encoder_taps: Sequence[int] = (5, 7)
    decoder_taps: Sequence[int] = (2, 5)
    dtype: Any = jnp.float32
    remat: bool = False  # block-level gradient checkpointing

    def setup(self):
        self.encoder = VAEEncoder(
            self.cfg, self.encoder_taps, dtype=self.dtype, remat=self.remat
        )
        self.decoder = VAEDecoder(
            self.cfg, self.decoder_taps, dtype=self.dtype, remat=self.remat
        )
        self.quant_conv = nn.Dense(2 * self.cfg.embed_dim, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.cfg.z_channels, dtype=self.dtype)

    def __call__(self, x):  # init convenience
        z, enc_taps = self.encode(x)
        rgb, dec_taps = self.decode(z)
        return z, rgb

    def encode(self, x):
        moments, taps = self.encoder(x)
        moments = self.quant_conv(moments)
        mean = moments[..., : self.cfg.embed_dim]
        latent = self.cfg.scale_factor * mean
        return latent, taps

    def decode(self, latent):
        z = latent / self.cfg.scale_factor
        z = self.post_quant_conv(z)
        return self.decoder(z)
