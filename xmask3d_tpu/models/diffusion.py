"""Gaussian diffusion schedules + sampling, JAX-native.

Capability parity with the reference's models/modeling/diffusion/
(gaussian_diffusion.py:61-91 beta schedules incl. `ldm_linear`,
q_sample:190, ddim loops :347-668; respace.py timestep respacing;
diffusion_builder.py:5-43). The main XMask3D pipeline uses only the
schedule + q_sample at t=0 (ldm.py:515-543); the samplers are provided for
full capability and run as lax.fori_loop on device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(schedule: str, steps: int) -> np.ndarray:
    if schedule == "linear":
        scale = 1000 / steps
        return np.linspace(scale * 1e-4, scale * 0.02, steps, dtype=np.float64)
    if schedule == "ldm_linear":
        # LDM's sqrt-space linear schedule (SD v1 uses beta in [0.00085, 0.012])
        scale = 1000 / steps
        return (
            np.linspace(
                (scale * 0.00085) ** 0.5, (scale * 0.012) ** 0.5, steps,
                dtype=np.float64,
            )
            ** 2
        )
    if schedule == "cosine":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        betas = []
        for i in range(steps):
            betas.append(min(1 - alpha_bar((i + 1) / steps) / alpha_bar(i / steps), 0.999))
        return np.array(betas, dtype=np.float64)
    raise ValueError(f"unknown beta schedule {schedule}")


def space_timesteps(num_timesteps: int, section_counts) -> Sequence[int]:
    """Evenly respace timesteps (reference respace.py:7-60, incl. 'ddimN')."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur, taken = 0.0, []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += stride
        all_steps += taken
        start_idx += size
    return all_steps


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Immutable schedule; all arrays are host numpy, converted lazily."""

    betas: np.ndarray

    @staticmethod
    def create(
        steps: int = 1000,
        noise_schedule: str = "ldm_linear",
        timestep_respacing: Optional[str] = None,
    ) -> "GaussianDiffusion":
        """Builder matching the reference create_gaussian_diffusion
        (diffusion_builder.py:5-43) for the schedule/q_sample path."""
        betas = make_betas(noise_schedule, steps)
        if timestep_respacing:
            used = sorted(space_timesteps(steps, timestep_respacing))
            alphas_cum = np.cumprod(1.0 - betas)
            last, new_betas = 1.0, []
            for t in used:
                new_betas.append(1 - alphas_cum[t] / last)
                last = alphas_cum[t]
            betas = np.array(new_betas)
        return GaussianDiffusion(betas=betas)

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas, axis=0)

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
        """Diffuse x_start to timestep t (reference gaussian_diffusion.py:190)."""
        ac = jnp.asarray(self.alphas_cumprod, x_start.dtype)
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        sqrt_ac = jnp.sqrt(ac[t]).reshape(shape)
        sqrt_1mac = jnp.sqrt(1.0 - ac[t]).reshape(shape)
        return sqrt_ac * x_start + sqrt_1mac * noise

    def eps_to_xstart(self, x_t, t, eps):
        ac = jnp.asarray(self.alphas_cumprod, x_t.dtype)
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        return (
            x_t - jnp.sqrt(1.0 - ac[t]).reshape(shape) * eps
        ) / jnp.sqrt(ac[t]).reshape(shape)

    def ddim_sample_loop(
        self,
        model: Callable,  # (x, t, **kwargs) -> eps prediction
        shape,
        rng: jax.Array,
        eta: float = 0.0,
        clip_denoised: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """DDIM sampling as a lax.fori_loop (reference ddim loops
        gaussian_diffusion.py:556-668, TPU-native control flow)."""
        model_kwargs = model_kwargs or {}
        n = self.num_timesteps
        ac = jnp.asarray(np.concatenate([[1.0], self.alphas_cumprod]), jnp.float32)
        rng, k0 = jax.random.split(rng)
        x = jax.random.normal(k0, shape, jnp.float32)

        def body(i, carry):
            x, rng = carry
            t = n - 1 - i
            tb = jnp.full((shape[0],), t, jnp.int32)
            eps = model(x, tb, **model_kwargs)
            x0 = self.eps_to_xstart(x, tb, eps)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            a_t, a_prev = ac[t + 1], ac[t]
            sigma = (
                eta
                * jnp.sqrt((1 - a_prev) / (1 - a_t))
                * jnp.sqrt(1 - a_t / a_prev)
            )
            rng, kn = jax.random.split(rng)
            noise = jax.random.normal(kn, shape, jnp.float32)
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * eps
            x = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise
            return x, rng

        x, _ = jax.lax.fori_loop(0, n, body, (x, rng))
        return x

    def p_sample_loop(
        self,
        model: Callable,
        shape,
        rng: jax.Array,
        clip_denoised: bool = False,
        model_kwargs: Optional[dict] = None,
    ) -> jnp.ndarray:
        """Ancestral DDPM sampling (reference p-sample loops :347-450)."""
        model_kwargs = model_kwargs or {}
        n = self.num_timesteps
        betas = jnp.asarray(self.betas, jnp.float32)
        ac = jnp.asarray(self.alphas_cumprod, jnp.float32)
        ac_prev = jnp.concatenate([jnp.ones((1,)), ac[:-1]])
        rng, k0 = jax.random.split(rng)
        x = jax.random.normal(k0, shape, jnp.float32)

        def body(i, carry):
            x, rng = carry
            t = n - 1 - i
            tb = jnp.full((shape[0],), t, jnp.int32)
            eps = model(x, tb, **model_kwargs)
            x0 = self.eps_to_xstart(x, tb, eps)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            mean = (
                jnp.sqrt(ac_prev[t]) * betas[t] / (1 - ac[t]) * x0
                + jnp.sqrt(1 - betas[t]) * (1 - ac_prev[t]) / (1 - ac[t]) * x
            )
            var = betas[t] * (1 - ac_prev[t]) / (1 - ac[t])
            rng, kn = jax.random.split(rng)
            noise = jax.random.normal(kn, shape, jnp.float32)
            x = jnp.where(t > 0, mean + jnp.sqrt(var) * noise, x0)
            return x, rng

        x, _ = jax.lax.fori_loop(0, n, body, (x, rng))
        return x
