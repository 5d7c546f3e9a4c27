"""Timestep samplers for diffusion training.

Capability parity with the reference models/modeling/diffusion/resample.py
(uniform + loss-aware second-moment resampling; unused by the reference's
main pipeline but part of the diffusion module surface). JAX-native: the
loss history lives in a small host-side ring buffer per timestep.
"""

from __future__ import annotations

import jax
import numpy as np


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def weights(self) -> np.ndarray:
        return np.ones((self.num_timesteps,), np.float64)

    def sample(self, batch_size: int, rng: np.random.RandomState):
        w = self.weights()
        p = w / w.sum()
        t = rng.choice(self.num_timesteps, size=(batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t.astype(np.int32), weights.astype(np.float32)


class LossSecondMomentResampler(UniformSampler):
    """Sample timesteps proportional to sqrt(E[loss^2]) with uniform
    smoothing, once each timestep has history_per_term observations."""

    def __init__(
        self,
        num_timesteps: int,
        history_per_term: int = 10,
        uniform_prob: float = 0.001,
    ):
        super().__init__(num_timesteps)
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_timesteps, history_per_term), np.float64)
        self._loss_counts = np.zeros((num_timesteps,), np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones((self.num_timesteps,), np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w = w / w.sum()
        w = w * (1 - self.uniform_prob) + self.uniform_prob / len(w)
        return w

    def update_with_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1
