"""Text-to-image sampling with classifier-free guidance.

Capability parity with the reference LatentDiffusion generation path
(ldm.py:120-206: forward_test with guidance_scale and
apply_model_with_guidence + DDIM loop). Not used by the segmentation
pipeline; completes the LDM module's API surface.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from xmask3d_tpu.models.diffusion import GaussianDiffusion


def sample_images(
    unet_apply,  # (x, t, context) -> eps   (bound SDUNet apply)
    vae_decode,  # (latent) -> (rgb, taps)
    diffusion: GaussianDiffusion,
    cond: jnp.ndarray,  # (B, 77, ctx) text conditioning
    uncond: jnp.ndarray,  # (B, 77, ctx) empty-prompt conditioning
    rng: jax.Array,
    latent_hw=(64, 64),
    latent_dim: int = 4,
    guidance_scale: float = 7.5,
    pixel_mean: float = 0.5,
    pixel_std: float = 0.5,
) -> jnp.ndarray:
    """DDIM sampling with CFG; returns images in [0, 1] (B, H, W, 3)."""
    b = cond.shape[0]

    if guidance_scale != 1.0:

        def model(x, t):
            # batched cond/uncond pass (ldm.py:134-143)
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate([cond, uncond], axis=0)
            eps, _ = unet_apply(x2, t2, ctx)
            eps_c, eps_u = jnp.split(eps, 2, axis=0)
            return eps_u + guidance_scale * (eps_c - eps_u)

    else:

        def model(x, t):
            eps, _ = unet_apply(x, t, cond)
            return eps

    latents = diffusion.ddim_sample_loop(
        model, (b, latent_hw[0], latent_hw[1], latent_dim), rng,
        clip_denoised=False,
    )
    rgb, _ = vae_decode(latents)
    return jnp.clip(rgb * pixel_std + pixel_mean, 0.0, 1.0)
