"""LDM feature extractor + implicit captioner conditioning.

Capability parity with the reference models/modeling/meta_arch/ldm.py:
- `LdmExtractor` (ldm.py:209-571): one VAE-encode -> q_sample(t=0, shared
  noise) -> UNet forward -> VAE-decode pass, harvesting multi-scale features
  at fixed block taps. Here taps are explicit return values of the Flax
  VAE/UNet (models/vae.py, models/sd_unet.py) instead of module hooks.
- `PositionalLinear` (ldm.py:574-588) and `LdmImplicitCaptionerExtractor`
  (ldm.py:591-676): projects the 768-d 3D global embedding into a 77-token
  pseudo-text conditioning `uncond + tanh(alpha) * proj(prefix)` plus a
  time-embedding offset.

The SD text conditioning (the reference's frozen CLIP text encoder inside
the `ldm` package) is the CLIPTextTower from models/clip.py: SD v1
conditions on the full 77x768 last-hidden-state, i.e. our `text_encodings`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xmask3d_tpu.models.clip import CLIPTextConfig, CLIPTextTower
from xmask3d_tpu.models.diffusion import GaussianDiffusion
from xmask3d_tpu.models.sd_unet import SDUNet, UNetConfig, UNET_TINY
from xmask3d_tpu.models.vae import AutoencoderKL, VAEConfig, VAE_TINY


@dataclasses.dataclass(frozen=True)
class LdmConfig:
    vae: VAEConfig = VAEConfig()
    unet: UNetConfig = UNetConfig()
    text: CLIPTextConfig = CLIPTextConfig()
    encoder_block_indices: Sequence[int] = (5, 7)
    unet_block_indices: Sequence[int] = (2, 5, 8, 11)
    decoder_block_indices: Sequence[int] = (2, 5)
    steps: Sequence[int] = (0,)
    diffusion_steps: int = 1000
    noise_schedule: str = "ldm_linear"

    def vae_stride(self) -> int:
        return 2 ** (len(self.vae.ch_mult) - 1)

    def feature_strides(self) -> List[int]:
        """Image-space stride of every tap, in emission order
        (encoder taps, unet taps x len(steps), decoder taps) — the
        re-derivation of reference ldm.py:255-310."""
        nrb = self.vae.num_res_blocks
        enc = [2 ** (idx // nrb) for idx in self.encoder_block_indices]
        vs = self.vae_stride()
        n_lv = len(self.unet.ch_mult)
        un = []
        for idx in self.unet_block_indices:
            r = idx // (self.unet.num_res_blocks + 1)
            lv = n_lv - 1 - r
            un.append(vs * 2**lv)
        dec = []
        for idx in self.decoder_block_indices:
            r = idx // (self.vae.num_res_blocks + 1)
            dec.append(vs // 2**r)
        return enc + un * len(self.steps) + dec


LDM_SD_V1 = LdmConfig()
LDM_TINY = LdmConfig(
    vae=VAE_TINY,
    unet=UNET_TINY,
    text=CLIPTextConfig(
        vocab_size=512, context_length=16, width=24, layers=2, heads=2, embed_dim=24
    ),
)


class LdmExtractor(nn.Module):
    """VAE + UNet + frozen text encoder, emitting tapped features.

    The shared noise buffer replaces the reference's torch-seeded buffer
    (ldm.py:240-250); exact-parity deployments overwrite it from a converted
    checkpoint.
    """

    cfg: LdmConfig = LDM_SD_V1
    dtype: Any = jnp.float32
    remat: bool = False  # block-level remat in the VAE/UNet (training)

    def setup(self):
        c = self.cfg
        self.vae = AutoencoderKL(
            c.vae,
            encoder_taps=c.encoder_block_indices,
            decoder_taps=c.decoder_block_indices,
            dtype=self.dtype,
            remat=self.remat,
        )
        self.unet = SDUNet(
            c.unet, tap_indices=c.unet_block_indices, dtype=self.dtype,
            remat=self.remat,
        )
        self.text_encoder = CLIPTextTower(c.text, dtype=self.dtype)
        self.diffusion = GaussianDiffusion.create(
            steps=c.diffusion_steps, noise_schedule=c.noise_schedule
        )
        latent = c.vae.embed_dim
        self.shared_noise = self.param(
            "shared_noise",
            nn.initializers.normal(1.0),
            (1, 64, 64, latent),
        )

    def embed_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """SD conditioning: full-sequence text encodings (B, T, width)."""
        _, encodings = self.text_encoder(tokens)
        return encodings

    def init_all(self, image, cond_inputs, tokens):
        """Init helper touching every submodule (incl. the text encoder,
        which the plain __call__ skips when cond_inputs are precomputed)."""
        self.embed_text(tokens)
        return self(image, cond_inputs)

    def __call__(
        self,
        image: jnp.ndarray,  # (B, H, W, 3) in [0, 1]
        cond_inputs: jnp.ndarray,  # (B, 77, ctx) conditioning sequence
        cond_emb: Optional[jnp.ndarray] = None,  # (B, steps, 4*model_ch)
    ) -> List[jnp.ndarray]:
        c = self.cfg
        normalized = (image - 0.5) / 0.5  # LDM pixel_mean/std (ldm.py:70-71)
        latent, encoder_feats = self.vae.encode(normalized.astype(self.dtype))

        b = image.shape[0]
        unet_feats: List[jnp.ndarray] = []
        for i, t in enumerate(c.steps):
            ce = cond_emb[:, i] if cond_emb is not None else None
            if t < 0:
                noisy = latent
                tb = jnp.zeros((b,), jnp.int32)
            else:
                tb = jnp.full((b,), t, jnp.int32)
                noise = self.shared_noise
                if noise.shape[1:3] != latent.shape[1:3]:
                    noise = jax.image.resize(
                        noise, (1,) + latent.shape[1:3] + noise.shape[3:],
                        "bicubic", antialias=False,  # ldm.py:531-536 F.interpolate
                    )
                noise = jnp.broadcast_to(noise, latent.shape).astype(latent.dtype)
                noisy = self.diffusion.q_sample(latent, tb, noise)
            _, taps = self.unet(noisy, tb, cond_inputs, cond_emb=ce)
            unet_feats.extend(taps)

        _, decoder_feats = self.vae.decode(latent)
        return [*encoder_feats, *unet_feats, *decoder_feats]


class PositionalLinear(nn.Module):
    """Linear + learned positional embedding broadcast over a sequence
    (reference ldm.py:574-588)."""

    out_features: int
    seq_len: int = 77
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pos = self.param(
            "positional_embedding",
            nn.initializers.truncated_normal(0.02),
            (1, self.seq_len, self.out_features),
        )
        x = nn.Dense(self.out_features, dtype=self.dtype, name="linear")(x)
        if x.ndim == 2:
            x = x[:, None, :] + pos.astype(x.dtype)
        return x


class LdmImplicitCaptionerExtractor(nn.Module):
    """Conditions the frozen-ish SD UNet on the 3D global embedding
    (reference ldm.py:591-676)."""

    cfg: LdmConfig = LDM_SD_V1
    learnable_time_embed: bool = True
    num_timesteps: int = 1
    dim_latent: int = 768
    dtype: Any = jnp.float32
    remat: bool = False

    def setup(self):
        c = self.cfg
        self.ldm_extractor = LdmExtractor(c, dtype=self.dtype, remat=self.remat)
        self.clip_project = PositionalLinear(
            c.text.width, seq_len=c.text.context_length, dtype=self.dtype
        )
        self.alpha_cond = self.param(
            "alpha_cond", nn.initializers.zeros, (1, c.text.context_length, c.text.width)
        )
        if self.learnable_time_embed:
            time_dim = 4 * c.unet.model_channels
            self.time_embed_project = PositionalLinear(
                time_dim, seq_len=self.num_timesteps, dtype=self.dtype
            )
            self.alpha_cond_time_embed = self.param(
                "alpha_cond_time_embed", nn.initializers.zeros, (time_dim,)
            )

    def condition(
        self, prefix: jnp.ndarray, uncond: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Implicit-captioner conditioning (reference ldm.py:656-668):
        cond_inputs = uncond + tanh(alpha_cond) * clip_project(prefix),
        cond_emb = tanh(alpha_cond_time_embed) * time_embed_project(prefix).
        `uncond` is the (1, T, W) embedded empty caption."""
        prefix_embed = self.clip_project(prefix)
        cond_inputs = (
            uncond
            + jnp.tanh(self.alpha_cond).astype(prefix_embed.dtype) * prefix_embed
        )
        cond_emb = None
        if self.learnable_time_embed:
            cond_emb = jnp.tanh(self.alpha_cond_time_embed).astype(
                prefix.dtype
            ) * self.time_embed_project(prefix)
        return cond_inputs, cond_emb

    def __call__(
        self,
        image: jnp.ndarray,  # (B, H, W, 3) in [0, 1]
        prefix: jnp.ndarray,  # (B, dim_latent) 3D global embedding
        uncond_tokens: jnp.ndarray,  # (1, T) tokenized ""
    ) -> List[jnp.ndarray]:
        uncond = self.ldm_extractor.embed_text(uncond_tokens)  # (1, T, W)
        cond_inputs, cond_emb = self.condition(prefix, uncond)
        return self.ldm_extractor(image, cond_inputs, cond_emb=cond_emb)
